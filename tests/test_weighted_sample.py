"""weighted_sample (functions/sampling.py): Efraimidis-Spirakis A-Res
weighted sampling without replacement — deterministic md5 draws, so the
exact selection is reproducible in plain Python."""

import hashlib
import math

import pyspark.sql.functions as F

from web_crawler_spark.functions import sampling as SAMP


def _es_key(doc_id, weight, salt="ws"):
    h = hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()
    u = int(h[:8], 16) / 0xFFFFFFFF
    return math.pow(u, 1.0 / weight)


def test_matches_python_reference_selection(spark):
    rows = [(i, (i % 7) + 1) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = sorted(r["doc_id"] for r in SAMP.weighted_sample(df, 25, "w").collect())
    expect = sorted(
        doc for doc, _ in sorted(
            rows, key=lambda r: (-_es_key(r[0], r[1]), r[0])
        )[:25]
    )
    assert got == expect


def test_zero_and_negative_weights_excluded(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, -5), (3, 10), (4, 1)], ["doc_id", "w"]
    )
    got = {r["doc_id"] for r in SAMP.weighted_sample(df, 10, "w").collect()}
    assert got == {3, 4}


def test_heavy_weight_dominates(spark):
    # one doc carries 10^6x the weight: u^(1/w) ~ 1 -> always sampled
    rows = [(i, 1) for i in range(200)] + [(999, 1_000_000)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = {r["doc_id"] for r in SAMP.weighted_sample(df, 5, "w").collect()}
    assert 999 in got and len(got) == 5


def test_plan_is_top_k_not_global_sort(spark):
    df = spark.range(10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 9 + 1).alias("w")
    )
    out = SAMP.weighted_sample(df, 10, "w")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
