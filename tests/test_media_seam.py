"""Pluggable real-media decode seam (round-3 verdict item 6): the
``precomputed`` parameter on image_features / audio_features / image_dhash
lets an environment WITH media libs inject its featurizer output, so the
in-container codec gap (pixel decode stub for compressed formats) is never
load-bearing — every downstream mm_ consumer runs unchanged either way."""

import pytest
from pyspark.sql import functions as F

from web_crawler_spark.multimodal import binaryops as B


def _bmp_corpus(spark, n=6):
    rows = [(f"u{i}", B.bmp_bytes(8 + i % 2, 6, key=i % 3)) for i in range(n)]
    return spark.createDataFrame(rows, "url string, payload binary")


def test_injected_features_match_decoded(spark):
    corpus = _bmp_corpus(spark)
    decoded = B.image_features(corpus)
    # the injected table stands in for an external featurizer run — here
    # it is the decode output itself plus noise columns the seam must drop
    injected = decoded.withColumn("extraneous", F.lit("x"))
    via_seam = B.image_features(corpus, precomputed=injected)
    assert via_seam.schema == decoded.schema
    assert sorted(map(tuple, via_seam.collect())) == sorted(
        map(tuple, decoded.collect())
    )


def test_seam_missing_urls_null_route(spark):
    corpus = _bmp_corpus(spark, n=4)
    injected = B.image_features(corpus).filter(F.col("url") != "u2")
    out = {r["url"]: r for r in
           B.image_features(corpus, precomputed=injected).collect()}
    assert len(out) == 4  # coverage follows the corpus, not the table
    assert out["u2"]["n_pixels"] is None  # absent -> failed-decode shape
    assert out["u0"]["n_pixels"] is not None


def test_seam_missing_columns_raise(spark):
    corpus = _bmp_corpus(spark, n=2)
    bad = spark.createDataFrame([("u0", 1)], "url string, width int")
    with pytest.raises(ValueError, match="missing columns"):
        B.image_features(corpus, precomputed=bad).collect()


def test_neardup_runs_unchanged_from_injected_dhash(spark):
    # mm_image_neardup's operator chain (image_dhash -> dhash_neardup_pairs)
    # from an injected hash table must equal the decoded-path result.
    rows = [(f"u{i}", B.bmp_bytes(16, 12, key=i % 2)) for i in range(8)]
    corpus = spark.createDataFrame(rows, "url string, payload binary")
    decoded_hashes = B.image_dhash(corpus)
    base = sorted(
        map(tuple, B.dhash_neardup_pairs(decoded_hashes).collect())
    )
    assert base  # key collisions guarantee identical images -> pairs
    injected = decoded_hashes.select("url", "width", "height", "dhash")
    via_seam = B.image_dhash(corpus, precomputed=injected)
    got = sorted(map(tuple, B.dhash_neardup_pairs(via_seam).collect()))
    assert got == base


def test_audio_seam_casts_schema(spark):
    rows = [(f"a{i}", B.wav_pcm_bytes(8000, 64, key=i)) for i in range(3)]
    corpus = spark.createDataFrame(rows, "url string, payload binary")
    decoded = B.audio_features(corpus)
    # external featurizers often emit wider types — the seam must cast
    injected = decoded.select(
        "url",
        F.col("n_samples").cast("int").alias("n_samples"),
        F.col("duration_ms").cast("int").alias("duration_ms"),
        F.col("sum_abs"),
        F.col("peak").cast("long").alias("peak"),
        F.col("zero_crossings"),
    )
    via_seam = B.audio_features(corpus, precomputed=injected)
    assert via_seam.schema == decoded.schema
    assert sorted(map(tuple, via_seam.collect())) == sorted(
        map(tuple, decoded.collect())
    )


def test_seam_duplicate_urls_keep_one_row_per_input(spark):
    # A duplicate url in the injected table must NOT fan the corpus row
    # out through the left join — the seam de-duplicates deterministically
    # (struct-min of the feature tuple) to keep the kernels' one-row-per-
    # payload contract.
    corpus = _bmp_corpus(spark, n=3)
    decoded = B.image_features(corpus)
    dup = decoded.filter(F.col("url") == "u1").withColumn(
        "width", F.col("width") + 100
    )
    injected = decoded.unionByName(dup)  # u1 appears twice, conflicting
    out = B.image_features(corpus, precomputed=injected)
    assert out.count() == 3
    rows = {r["url"]: r for r in out.collect()}
    # struct-min picks the smaller width variant (the original)
    base = {r["url"]: r for r in decoded.collect()}
    assert rows["u1"]["width"] == base["u1"]["width"]
