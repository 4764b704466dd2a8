"""TimeMap capture summary semantics (cc_timemap composition): revisit
ratio arithmetic over the CDX digest column."""

from pyspark.sql import functions as F

from web_crawler_spark.sources.cdx import cdx_records


def test_revisit_ratio_hand_computed(spark):
    # url A: 4 captures, 2 distinct bodies -> ratio 500
    # url B: 1 capture -> ratio 0
    rows = [
        ("https://a", 0, b"one"), ("https://a", 1, b"two"),
        ("https://a", 2, b"one"), ("https://a", 3, b"two"),
        ("https://b", 0, b"solo"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, off int, html binary"
    ).select(
        "url",
        F.timestamp_seconds(F.lit(1700000000) + F.col("off")).alias("warc_ts"),
        "html",
    )
    idx = cdx_records(pages)
    out = {
        r["url"]: r
        for r in idx.groupBy("url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("digest").cast("long").alias("nd"),
        )
        .select(
            "url", "n", "nd",
            F.floor(F.lit(1000) * (F.col("n") - F.col("nd")) / F.col("n"))
            .cast("long").alias("ratio"),
        )
        .collect()
    }
    assert out["https://a"]["n"] == 4 and out["https://a"]["nd"] == 2
    assert out["https://a"]["ratio"] == 500
    assert out["https://b"]["ratio"] == 0
