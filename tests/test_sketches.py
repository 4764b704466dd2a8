"""Misra-Gries heavy-hitter sketch tests (operators/sketches.py).

The exact regime is certified by the a13_heavy_hitters_mg oracle query;
these tests pin the APPROXIMATE regime's guarantees against exact counts:
est ≤ true ≤ est + max_err, and every item with true count > max_err
survives the merge.
"""

from __future__ import annotations

from collections import Counter

import pytest

from pyspark.sql import functions as F

from web_crawler_spark.operators import sketches as SK

# Zipf-ish stream: item i appears ~600/i times — heavy head, long tail.
STREAM = [f"w{i}" for i in range(1, 120) for _ in range(600 // i)]


@pytest.fixture(scope="module")
def items(spark):
    df = spark.createDataFrame([(x,) for x in STREAM], ["item"])
    return df.repartition(8)  # force multi-partition summaries + merge


def _exact() -> Counter:
    return Counter(STREAM)


def test_exact_regime_equals_groupby(spark, items):
    got = SK.mg_heavy_hitters(items, "item", k=10, capacity=1000).collect()
    truth = _exact()
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["item"], r["est"]) for r in got] == want
    assert all(r["max_err"] == 0 for r in got)


def test_approximate_regime_bounds(spark, items):
    rows = SK.mg_heavy_hitters(items, "item", k=1000, capacity=16).collect()
    truth = _exact()
    assert rows and rows[0]["max_err"] > 0  # genuinely approximate
    max_err = rows[0]["max_err"]
    present = set()
    for r in rows:
        t = truth[r["item"]]
        assert r["est"] <= t, (r["item"], r["est"], t)
        assert t <= r["est"] + max_err, (r["item"], r["est"], t, max_err)
        present.add(r["item"])
    # retention: anything strictly heavier than the total decrement mass
    # cannot have been evicted from every partition summary
    for item, t in truth.items():
        if t > max_err:
            assert item in present, (item, t, max_err)


def test_head_ranking_survives_sketching(spark, items):
    got = [
        r["item"]
        for r in SK.mg_heavy_hitters(items, "item", k=5, capacity=32).collect()
    ]
    truth = sorted(_exact().items(), key=lambda kv: (-kv[1], kv[0]))
    # the true top-3 are far above the error floor — order must hold
    assert got[:3] == [w for w, _ in truth[:3]]


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), ("b",), (None,)], ["item"]
    )
    got = SK.mg_heavy_hitters(df, "item", k=10, capacity=8).collect()
    assert [(r["item"], r["est"]) for r in got] == [("a", 2), ("b", 1)]


def test_shuffle_is_summary_sized(spark, items):
    # the plan must aggregate the mapInPandas summary, never the raw items:
    # the only wide exchange feeds a hash agg over ≤ capacity·partitions rows
    df = SK.mg_heavy_hitters(items, "item", k=5, capacity=16)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    # the summary row count that crosses the exchange is bounded by
    # capacity·partitions + one Δ row per partition, independent of N
    n_summary = items.mapInPandas(
        SK._mg_summarize(16), SK._SUMMARY_SCHEMA
    ).count()
    assert n_summary <= (16 + 1) * 8
