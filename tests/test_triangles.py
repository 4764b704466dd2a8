"""triangles (operators/graph.py): per-node triangle counts + local
clustering coefficient vs a brute-force reference."""

from itertools import combinations

from web_crawler_spark.operators import graph as G


def _ref(pairs):
    adj = {}
    for u, v in pairs:
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    tri = {v: 0 for v in adj}
    for v in adj:
        for a, b in combinations(sorted(adj[v]), 2):
            if b in adj.get(a, ()):
                tri[v] += 1
    out = {}
    for v in adj:
        d = len(adj[v])
        c = round(2.0 * tri[v] / (d * (d - 1)), 6) if d >= 2 else 0.0
        out[v] = (d, tri[v], c)
    return out


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, ["src_host", "dst_host"])
    return {
        r.node: (r.degree, r.triangles, r.clustering)
        for r in G.triangles(df).collect()
    }


def test_clique_ring_and_tail(spark):
    pairs = (
        [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
        + [("r0", "r1"), ("r1", "r2"), ("r2", "r3"), ("r3", "r0")]
        + [("c0", "t1")]
    )
    got = _run(spark, pairs)
    assert got == _ref(pairs)
    assert got["c1"] == (4, 6, 1.0)       # K5 interior node
    assert got["r0"][1] == 0              # 4-ring closes no triangles
    assert got["t1"] == (1, 0, 0.0)


def test_mixed_pseudorandom(spark):
    pairs = [
        (f"n{(5 * i) % 17}", f"n{(5 * i + j) % 17}")
        for i in range(17)
        for j in (1, 2, 4, 8)
    ]
    assert _run(spark, pairs) == _ref(pairs)


def test_direction_and_duplicates_irrelevant(spark):
    base = [("a", "b"), ("b", "c"), ("c", "a")]
    noisy = base + [(v, u) for u, v in base] + base + [("a", "a")]
    got = _run(spark, noisy)
    assert got == _ref(base)
    assert all(v == (2, 1, 1.0) for v in got.values())
