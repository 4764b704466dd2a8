"""tx_source_dup_rates arithmetic on a planted duplicate mix."""

import __spark_entry__ as E
from pyspark.sql import functions as F


def test_dup_rate_arithmetic(spark):
    rows = [
        (0, "same text", "feedA"), (1, "same text", "feedA"),
        (2, "same text", "feedA"), (3, "unique one", "feedA"),
        (4, "solo", "feedB"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    per = (
        df.select("source", F.md5("text").alias("fp"))
        .groupBy("source", "fp").agg(F.count(F.lit(1)).alias("n"))
    )
    out = {
        r["source"]: r
        for r in per.groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
        )
        .collect()
    }
    assert out["feedA"]["n_docs"] == 4 and out["feedA"]["n_distinct"] == 2
    assert out["feedB"]["n_docs"] == 1 and out["feedB"]["n_distinct"] == 1
    # dup_ratio_milli for feedA = floor(1000 * 2/4) = 500
    assert 1000 * (4 - 2) // 4 == 500
