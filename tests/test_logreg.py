"""Distributed logistic-regression training tests (operators/logreg.py)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from web_crawler_spark.operators import logreg as LR


def _frame(spark, n=400, parts=1):
    # separable-ish 1-D task: y = (k >= 200), feature centered/scaled by
    # powers of two so every float op is exact
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id").cast("double") - 256.0) / 128.0).alias("x1"),
        (F.col("id") >= 200).cast("int").alias("y"),
    )
    return df.repartition(parts)


def test_loss_decreases_and_learns(spark):
    df = _frame(spark)
    w, trace = LR.train_logreg(df, ["x1"], "y", iters=6, lr=16.0)
    assert all(a > b for a, b in zip(trace, trace[1:]))  # strictly improving
    scored = LR.predict_logreg(df, w, ["x1"])
    acc = scored.filter(F.col("pred") == F.col("y")).count() / 400
    assert acc > 0.95
    assert w[1] > 0  # larger x1 → positive class


def test_partition_invariant_weights(spark):
    """The fixed-point gradient quantization makes the weight trajectory
    independent of partitioning — the property that lets a 1000-executor
    retrain reproduce a laptop run bit-for-bit."""
    w1, t1 = LR.train_logreg(_frame(spark, parts=1), ["x1"], "y", iters=4)
    w8, t8 = LR.train_logreg(_frame(spark, parts=8), ["x1"], "y", iters=4)
    assert w1 == w8  # bitwise, not approx
    assert t1 == t8


def test_matches_independent_python(spark):
    xs = [(-256.0 + i) / 128.0 for i in range(400)]
    ys = [1.0 if i >= 200 else 0.0 for i in range(400)]
    w = [0.0, 0.0]
    fp = LR.GRAD_FP
    for _ in range(4):
        g = [0, 0]
        for x, y in zip(xs, ys):
            p = 1.0 / (1.0 + math.exp(-(w[0] + w[1] * x)))
            g[0] += math.floor((p - y) * fp)
            g[1] += math.floor((p - y) * x * fp)
        w = [w[k] - 16.0 * (g[k] / fp) / 400 for k in range(2)]
    got, _ = LR.train_logreg(_frame(spark), ["x1"], "y", iters=4, lr=16.0)
    assert got == pytest.approx(w, abs=0.0)  # bit-identical


def test_empty_frame_raises(spark):
    df = _frame(spark).filter(F.lit(False))
    with pytest.raises(ValueError):
        LR.train_logreg(df, ["x1"], "y")


# --- learned frontier prioritization ---------------------------------------

def test_learned_priority_prefers_shallow_after_training(spark):
    from web_crawler_spark.operators.logreg import learned_priority

    crawled = spark.createDataFrame(
        [(f"https://s.ex/art{i}", 1) for i in range(40)]
        + [(f"https://s.ex/a/b/c/d/e{i}?x=1&y=2&z=3", 0) for i in range(40)],
        "url string, label int",
    )
    frontier = spark.createDataFrame(
        [("https://f.ex/good1",), ("https://f.ex/a/b/c/d/bad1?q=1&r=2&s=3",)],
        "url string",
    )
    out = {r["url"]: r for r in learned_priority(crawled, frontier).collect()}
    good = out["https://f.ex/good1"]
    bad = out["https://f.ex/a/b/c/d/bad1?q=1&r=2&s=3"]
    assert good["score"] > bad["score"]
    assert (good["rank"], bad["rank"]) == (1, 2)


def test_learned_priority_digit_feature_carries_signal(spark):
    from web_crawler_spark.operators.logreg import learned_priority

    # identical shapes; ONLY the digit flag separates labels
    crawled = spark.createDataFrame(
        [(f"https://s.ex/x{i}", 0) for i in range(30)]
        + [("https://s.ex/" + "ab"[i % 2] * (i + 1), 1) for i in range(30)],
        "url string, label int",
    )
    frontier = spark.createDataFrame(
        [("https://f.ex/page9",), ("https://f.ex/pageZ",)],
        "url string",
    )
    out = {
        r["url"]: r["score"]
        for r in learned_priority(crawled, frontier, lr=1.0, iters=3).collect()
    }
    assert out["https://f.ex/pageZ"] > out["https://f.ex/page9"]


def test_learned_priority_rank_is_dense_and_deterministic(spark):
    from web_crawler_spark.operators.logreg import learned_priority

    crawled = spark.createDataFrame(
        [(f"https://s.ex/a{i}", i % 2) for i in range(20)],
        "url string, label int",
    )
    frontier = spark.createDataFrame(
        [(f"https://f.ex/p{i}",) for i in range(7)], "url string"
    )
    out = learned_priority(crawled, frontier).collect()
    assert sorted(r["rank"] for r in out) == list(range(1, 8))
    # equal scores (identical features) tie-break by url ascending
    by_rank = sorted(out, key=lambda r: r["rank"])
    same = [r for r in by_rank if r["score"] == by_rank[0]["score"]]
    assert [r["url"] for r in same] == sorted(r["url"] for r in same)
