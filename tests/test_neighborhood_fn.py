"""neighborhood_function (graph.py): ANF curve + effective diameter —
monotone growth, quantile semantics, HLL-tolerance agreement with exact
reachability, clique radius 1."""

import pytest

from web_crawler_spark.operators import graph as G


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src_host string, dst_host string")


def _exact_nf(pairs, rounds):
    # exact N(r) = sum over v of |{u: d(u->v) <= r}| (in-ball convention)
    nodes = sorted({x for p in pairs for x in p})
    preds = {v: {u for u, w in pairs if w == v and u != w} for v in nodes}
    balls = {v: {v} for v in nodes}
    out = [sum(len(b) for b in balls.values())]
    for _ in range(rounds):
        balls = {
            v: balls[v] | {x for u in preds[v] for x in balls[u]} | preds[v]
            for v in nodes
        }
        out.append(sum(len(b) for b in balls.values()))
    return out


def test_monotone_and_quantile_semantics(spark):
    # directed 6-ring: ball grows by 1 per round
    pairs = [(f"n{i}", f"n{(i + 1) % 6}") for i in range(6)]
    rows = G.neighborhood_function(_df(spark, pairs), rounds=5).orderBy(
        "r").collect()
    assert [r["r"] for r in rows] == list(range(6))
    nf = [r["nf_micro"] for r in rows]
    assert all(b >= a for a, b in zip(nf, nf[1:]))
    assert rows[-1]["frac_milli"] == 1000
    flags = [r["is_effective_radius"] for r in rows]
    assert sum(flags) == 1
    eff = [r["r"] for r in rows if r["is_effective_radius"]][0]
    for r in rows:
        if r["r"] < eff:
            assert 1000 * r["nf_micro"] < 900 * nf[-1]
        if r["r"] == eff:
            assert 1000 * r["nf_micro"] >= 900 * nf[-1]


def test_matches_exact_reachability_within_hll_tolerance(spark):
    pairs = [(f"n{i}", f"n{(i + 1) % 6}") for i in range(6)] + [
        ("n0", "n3"), ("a", "b"), ("b", "c")
    ]
    rows = G.neighborhood_function(_df(spark, pairs), rounds=4).orderBy(
        "r").collect()
    exact = _exact_nf(pairs, 4)
    for row, ex in zip(rows, exact):
        est = row["nf_micro"] / 1e6
        assert est == pytest.approx(ex, rel=0.08)


def test_clique_effective_radius_is_one(spark):
    nodes = [f"k{i}" for i in range(5)]
    pairs = [(a, b) for a in nodes for b in nodes if a != b]
    rows = G.neighborhood_function(_df(spark, pairs), rounds=3).collect()
    eff = [r["r"] for r in rows if r["is_effective_radius"]]
    assert eff == [1]


def test_unit_scale_whole_units(spark):
    pairs = [("a", "b"), ("b", "c")]
    rows = G.neighborhood_function(
        _df(spark, pairs), rounds=2, unit_pow10=0
    ).orderBy("r").collect()
    # whole-unit sums: N(0) ~ 3 single-node balls
    assert rows[0]["nf_micro"] == pytest.approx(3, abs=1)
    assert rows[-1]["frac_milli"] == 1000
