"""graph_summary (reciprocity + Newman degree assortativity) and
host_error_wilson (Wilson lower-bound error ranking) — closed-form
fixtures (star graph r = -1), pure-Python formula parity, and the
small-sample-can't-outrank-volume property the bound exists for."""

import math

from web_crawler_spark.operators.aggregate import host_error_wilson
from web_crawler_spark.operators.graph import graph_summary


def _edges(spark, pairs):
    return spark.createDataFrame(
        list(pairs), "src_host string, dst_host string"
    )


def test_graph_summary_star_is_perfectly_disassortative(spark):
    r = graph_summary(_edges(spark, [("a", "b"), ("a", "c"), ("a", "d")])).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["recip_edges"]) == (4, 3, 0)
    assert r["reciprocity_milli"] == 0
    assert r["assortativity"] == -1.0  # K_{1,3}: Newman's closed form


def test_graph_summary_reciprocity_and_dedup(spark):
    # duplicates + self-loop collapse; a<->b reciprocal, a->c not
    r = graph_summary(_edges(spark, [
        ("a", "b"), ("a", "b"), ("b", "a"), ("a", "c"), ("c", "c"),
    ])).collect()[0]
    assert (r["n_edges"], r["recip_edges"]) == (3, 2)
    assert r["reciprocity_milli"] == math.floor(1000 * 2 / 3)


def test_graph_summary_python_parity(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
    got = graph_summary(_edges(spark, pairs)).collect()[0]
    e = sorted(set(pairs))
    und = e + [(b, a) for a, b in e]
    deg = {}
    for s, _ in und:
        deg[s] = deg.get(s, 0) + 1
    xs = [deg[s] for s, _ in und]
    ys = [deg[d] for _, d in und]
    m = len(und)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    ref = (m * sxy - sx * sy) / math.sqrt(
        (m * sxx - sx * sx) * (m * syy - sy * sy)
    )
    assert got["assortativity"] == round(ref, 6)
    assert got["recip_edges"] == 2  # a<->c (c,a)+(a,c)


def _fetches(spark, rows):
    return spark.createDataFrame(list(rows), "host string, is_error boolean")


def test_wilson_volume_beats_tiny_sample(spark):
    rows = [("tiny", True)]  # 1/1 errors
    rows += [("big", i < 300) for i in range(1000)]  # 300/1000
    got = {r["host"]: r for r in host_error_wilson(_fetches(spark, rows)).collect()}
    z = 1.96
    lb_tiny = (1.0 + z * z / 2.0 - z * math.sqrt(0.0 + z * z / 4.0)) / (1.0 + z * z)
    assert got["tiny"]["wilson_lb"] == round(lb_tiny, 6)
    assert got["tiny"]["err_rate_milli"] == 1000
    assert got["big"]["err_rate_milli"] == 300
    # the whole point: the 30%-at-volume host outranks the 100%-of-1 host
    assert got["big"]["wilson_lb"] > got["tiny"]["wilson_lb"]


def test_wilson_python_parity_and_edges(spark):
    rows = [("h", i % 4 == 0) for i in range(37)] + [("clean", False)] * 5
    got = {r["host"]: r for r in host_error_wilson(_fetches(spark, rows)).collect()}
    n, k = 37.0, 10.0  # ceil(37/4)
    p, z = k / n, 1.96
    ref = (p + z * z / (2.0 * n) - z * math.sqrt(
        p * (1.0 - p) / n + z * z / (4.0 * n * n))) / (1.0 + z * z / n)
    assert got["h"]["n_errors"] == 10
    assert got["h"]["wilson_lb"] == round(ref, 6)
    assert got["clean"]["n_errors"] == 0 and got["clean"]["wilson_lb"] == 0.0


def test_wilson_min_fetches_gate(spark):
    rows = [("a", True)] + [("b", False)] * 10
    got = host_error_wilson(_fetches(spark, rows), min_fetches=5).collect()
    assert {r["host"] for r in got} == {"b"}
