"""hyperball (operators/graph.py): HyperBall harmonic centrality / ANF
(Boldi & Vigna 2013). Differential test: an independent pure-Python
replay of the register algebra (hashlib md5, dict registers) must match
the DataFrame implementation value-for-value, plus structural checks on
graphs whose exact distances are known by hand."""

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

import pytest

from web_crawler_spark.operators import graph as G
from web_crawler_spark.operators.sketches import _hll_alpha


def _round6(x):
    """Spark's ROUND(double, 6): HALF_UP over the shortest round-trip
    decimal rendering (java BigDecimal.valueOf semantics — python repr()
    is the same shortest-representation family), NOT python's
    exact-binary banker's round()."""
    return float(
        Decimal(repr(float(x))).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )


def _ref_hyperball(edges, rounds, p):
    """Pure-Python HyperBall: same md5 register addressing, register-max
    rounds along in-edges, 6dp-rounded estimates, clamped shell deltas."""
    m = 1 << p
    alpha = _hll_alpha(m)

    def fields(s):
        d = hashlib.md5(("hll:" + s).encode()).hexdigest()
        bucket = int(d[:8], 16) % m
        w = int(d[8:16], 16)
        rho = 33 if w == 0 else 33 - len(bin(w)[2:])
        return bucket, rho

    e = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({x for pair in e for x in pair})
    regs = {}
    for v in nodes:
        b, r = fields(v)
        regs[v] = {b: r}

    def est(rv):
        present = len(rv)
        s = (m - present) + sum(2.0 ** -r for r in rv.values())
        e_raw = alpha * m * m / s
        v0 = m - present
        val = m * math.log(m / v0) if (e_raw <= 2.5 * m and v0 > 0) else e_raw
        return _round6(val)

    ball = {v: est(regs[v]) for v in nodes}
    harm = {v: 0.0 for v in nodes}
    for t in range(1, rounds + 1):
        new = {v: dict(regs[v]) for v in nodes}
        for s, d in e:
            for b, r in regs[s].items():
                if new[d].get(b, 0) < r:
                    new[d][b] = r
        regs = new
        for v in nodes:
            cur = est(regs[v])
            harm[v] += max(0.0, cur - ball[v]) / float(t)
            ball[v] = cur
    return {v: (_round6(ball[v]), _round6(harm[v])) for v in nodes}


EDGES = [
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
    ("a", "c"), ("d", "b"), ("e", "a"),
]


def _run(spark, edges, rounds, p):
    df = spark.createDataFrame(edges, ["src_host", "dst_host"])
    out = G.hyperball(df, rounds=rounds, p=p)
    return {r.node: (r.ball_est, r.harmonic) for r in out.collect()}


def test_matches_pure_python_reference(spark):
    got = _run(spark, EDGES, rounds=4, p=6)
    want = _ref_hyperball(EDGES, rounds=4, p=6)
    assert set(got) == set(want)
    for v in want:
        assert got[v][0] == pytest.approx(want[v][0], abs=1e-6), v
        assert got[v][1] == pytest.approx(want[v][1], abs=1e-6), v


def test_reference_at_other_p_and_rounds(spark):
    got = _run(spark, EDGES, rounds=2, p=4)
    want = _ref_hyperball(EDGES, rounds=2, p=4)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6), v


def test_ball_semantics_on_path(spark):
    # a -> b -> c: after 2 rounds c's ball holds {a,b,c}; a's only {a}
    # (balls grow along IN-edges — the harmonic-centrality convention).
    # p=12 (m=4096) keeps linear counting within ~1% of exact counts.
    got = _run(spark, [("a", "b"), ("b", "c")], rounds=2, p=12)
    assert got["a"][0] == pytest.approx(1.0, rel=0.05)
    assert got["b"][0] == pytest.approx(2.0, rel=0.05)
    assert got["c"][0] == pytest.approx(3.0, rel=0.05)
    # harmonic: c ≈ 1/1 (from b) + 1/2 (from a); b ≈ 1; a ≈ 0
    assert got["c"][1] == pytest.approx(1.5, rel=0.08)
    assert got["b"][1] == pytest.approx(1.0, rel=0.08)
    assert got["a"][1] == pytest.approx(0.0, abs=0.05)


def test_self_loops_and_duplicate_edges_ignored(spark):
    base = _run(spark, [("a", "b"), ("b", "c")], rounds=2, p=6)
    noisy = _run(
        spark,
        [("a", "b"), ("a", "b"), ("b", "c"), ("a", "a"), ("c", "c")],
        rounds=2,
        p=6,
    )
    assert base == noisy
