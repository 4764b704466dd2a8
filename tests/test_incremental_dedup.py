"""Incremental dedup against a persisted MinHash signature index
(operators/dedup.py::minhash_index / dedup_against_index).

The oracle query `dd_incremental_dedup` certifies the md5-portable path
value-for-value; these tests pin the semantics the oracle can't see:
index-side text is never re-read, fast/portable path agreement, the
kept-rows-extend-the-index loop, and estimator behavior.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from web_crawler_spark.operators import dedup as DD

BASE = [
    # corpus (indexed) docs
    (0, "the quick brown fox jumps over the lazy dog near the old river bank"),
    (1, "pack my box with five dozen liquor jugs before the summer sale ends"),
    (2, "a completely different corpus document about spark shuffle planning"),
    # new batch: 10 = near-dup of 0, 11 = fresh, 12/13 = near-dups of each
    # other (batch-internal), 14 = fresh
    (10, "the quick brown fox jumps over the lazy dog near the old river bend"),
    (11, "entirely novel text with no overlap to anything indexed so far ok"),
    (12, "repeated boilerplate navigation menu footer copyright twenty four x"),
    (13, "repeated boilerplate navigation menu footer copyright twenty four y"),
    (14, "another genuinely unique document that should simply be kept fine"),
]


@pytest.fixture(scope="module")
def frames(spark):
    df = spark.createDataFrame(BASE, ["doc_id", "text"])
    corpus = df.filter("doc_id < 10")
    batch = df.filter("doc_id >= 10")
    return corpus, batch


PARAMS = dict(n=3, k=16, bands=8, threshold=0.4)


@pytest.mark.parametrize("portable", [False, True])
def test_statuses_and_matches(spark, frames, portable):
    corpus, batch = frames
    idx = DD.minhash_index(corpus, n=3, k=16, portable_hash=portable)
    out = {
        r["doc_id"]: (r["status"], r["match_id"])
        for r in DD.dedup_against_index(
            batch, idx, portable_hash=portable, **PARAMS
        ).collect()
    }
    assert out[10] == ("dup_of_index", 0)
    assert out[11][0] == "kept" and out[11][1] is None
    assert out[12][0] == "kept"  # smaller id of the batch-internal pair
    assert out[13] == ("dup_of_batch", 12)
    assert out[14][0] == "kept"


def test_kept_rows_extend_the_index(spark, frames):
    """The epoch loop: append kept sigs, re-run the SAME batch → everything
    is now a dup_of_index (idempotent ingestion)."""
    corpus, batch = frames
    idx = DD.minhash_index(corpus, n=3, k=16)
    first = DD.dedup_against_index(batch, idx, **PARAMS)
    kept = first.filter("status = 'kept'").select("doc_id", "sig")
    idx2 = idx.unionByName(kept)
    again = DD.dedup_against_index(batch, idx2, **PARAMS)
    statuses = {r["doc_id"]: r["status"] for r in again.collect()}
    assert set(statuses.values()) == {"dup_of_index"}
    # and each batch doc matches itself-or-better (min index id ≤ own id)
    for r in again.collect():
        assert r["match_id"] <= r["doc_id"]


def test_index_side_text_never_read(spark, frames):
    """The contract that makes this incremental: dedup needs only the
    (id, sig) index — corpus TEXT is not an input at all."""
    corpus, batch = frames
    idx = DD.minhash_index(corpus, n=3, k=16).localCheckpoint(eager=True)
    # a poisoned corpus frame that raises if its text is ever evaluated
    out = DD.dedup_against_index(batch, idx, **PARAMS)
    assert "text" not in [f.name for f in idx.schema.fields]
    assert out.filter("status = 'dup_of_index'").count() == 1


def test_estimate_matches_signature_agreement(spark, frames):
    """est_jaccard must equal matching-component fraction of the two sigs
    (k=16 → multiples of 1/16), and identical docs estimate 1.0."""
    corpus, _ = frames
    idx = DD.minhash_index(corpus, n=3, k=16)
    clone = corpus.withColumn("doc_id", F.col("doc_id") + 100)
    out = DD.dedup_against_index(clone, idx, **PARAMS)
    rows = out.filter("status = 'dup_of_index'").collect()
    assert len(rows) == 3
    for r in rows:
        assert r["est_jaccard"] == 1.0
        assert r["match_id"] == r["doc_id"] - 100


def test_band_join_is_slim(spark, frames):
    """Plan shape: no `sig`, `text`, or gram column may cross the band-join
    exchange — ids and band keys only (the 100 TB shuffle contract)."""
    corpus, batch = frames
    idx = DD.minhash_index(corpus, n=3, k=16)
    out = DD.dedup_against_index(batch, idx, **PARAMS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # find exchanges feeding the band joins: they project band/band_sig + id
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        keys = m.group(1)
        if "band" in keys:
            assert not re.search(r"(?<!band_)sig#", keys), keys
            assert "text#" not in keys, keys
