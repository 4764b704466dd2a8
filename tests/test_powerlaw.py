"""degree_powerlaw: Clauset-Shalizi-Newman discrete MLE over the degree
histogram (graph.py::degree_powerlaw) — hand-computed alpha, tail/dmin
semantics, distinct-pair collapse, direction switch, empty-tail NULL."""

import math

import pytest
from pyspark.sql import functions as F

from web_crawler_spark.operators import graph as G


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src_host string, dst_host string")


def _alpha(degrees, dmin):
    tail = [d for d in degrees if d >= dmin]
    if not tail:
        return None
    # fold over the histogram ascending by degree value — the operator's
    # documented accumulation order
    hist = {}
    for d in tail:
        hist[d] = hist.get(d, 0) + 1
    s = 0.0
    for d in sorted(hist):
        s += hist[d] * math.log(d / (dmin - 0.5))
    return round(1.0 + len(tail) / s, 6)


def test_hand_computed_alpha(spark):
    # in-degrees: a=3, b=2, c=1  (distinct srcs per dst)
    pairs = [
        ("s1", "a"), ("s2", "a"), ("s3", "a"),
        ("s1", "b"), ("s2", "b"),
        ("s1", "c"),
    ]
    row = G.degree_powerlaw(_edges(spark, pairs), dmin=2).collect()[0]
    assert row["dmin"] == 2
    assert row["n_tail"] == 2          # a and b
    assert row["n_nodes"] == 3         # dsts with in-degree >= 1
    assert row["max_degree"] == 3
    assert row["alpha"] == pytest.approx(_alpha([3, 2, 1], 2), abs=1e-9)


def test_distinct_pairs_and_self_loops(spark):
    # duplicated edge rows collapse; self loops dropped before degrees
    pairs = [
        ("s1", "a"), ("s1", "a"), ("s1", "a"),   # one distinct pair
        ("s2", "a"),
        ("a", "a"),                                # self loop ignored
        ("s1", "b"), ("s2", "b"), ("s3", "b"),
    ]
    row = G.degree_powerlaw(_edges(spark, pairs), dmin=2).collect()[0]
    assert row["n_tail"] == 2          # a: 2, b: 3
    assert row["max_degree"] == 3
    assert row["alpha"] == pytest.approx(_alpha([2, 3], 2), abs=1e-9)


def test_direction_out(spark):
    # out-degrees: s1 -> 3 targets, s2 -> 1
    pairs = [("s1", "a"), ("s1", "b"), ("s1", "c"), ("s2", "a")]
    row = G.degree_powerlaw(
        _edges(spark, pairs), dmin=2, direction="out"
    ).collect()[0]
    assert row["n_tail"] == 1
    assert row["n_nodes"] == 2
    assert row["alpha"] == pytest.approx(_alpha([3, 1], 2), abs=1e-9)


def test_empty_tail_null_alpha(spark):
    pairs = [("s1", "a"), ("s2", "b")]   # all in-degrees 1 < dmin=2
    row = G.degree_powerlaw(_edges(spark, pairs), dmin=2).collect()[0]
    assert row["n_tail"] == 0
    assert row["alpha"] is None
    assert row["n_nodes"] == 2


def test_dmin_one_uses_half_shift(spark):
    # dmin=1: ln(d/0.5) so even degree-1 nodes contribute ln 2
    pairs = [("s1", "a"), ("s2", "a"), ("s1", "b")]
    row = G.degree_powerlaw(_edges(spark, pairs), dmin=1).collect()[0]
    assert row["n_tail"] == 2
    assert row["alpha"] == pytest.approx(_alpha([2, 1], 1), abs=1e-9)


def test_degree_histogram_consistency(spark):
    import __spark_entry__ as E

    rows = E.queries()["gr_degree_histogram"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    ins = [r for r in rows if r["direction"] == "in"]
    outs = [r for r in rows if r["direction"] == "out"]
    assert ins and outs
    # Σ degree·n_hosts over a direction = number of distinct edges, and
    # must agree between the two directions
    n_in = sum(r["degree"] * r["n_hosts"] for r in ins)
    n_out = sum(r["degree"] * r["n_hosts"] for r in outs)
    assert n_in == n_out > 0
    # heavy tail present: some in-degree >= 10 while out-degrees are flat
    assert max(r["degree"] for r in ins) >= 10
