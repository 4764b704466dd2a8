"""kcore (operators/graph.py): distributed h-index coreness vs an exact
Batagelj-Zaversnik peeling reference, plus hand-checkable structures."""

from collections import defaultdict

from web_crawler_spark.operators import graph as G


def _ref_coreness(pairs):
    adj = defaultdict(set)
    for u, v in pairs:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    deg = {v: len(ns) for v, ns in adj.items()}
    alive = set(adj)
    core, k = {}, 0
    while alive:
        v = min(alive, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        core[v] = k
        alive.remove(v)
        for w in adj[v]:
            if w in alive:
                deg[w] -= 1
    return core


def _run(spark, pairs, rounds=8):
    df = spark.createDataFrame(pairs, ["src_host", "dst_host"])
    return {
        r.node: (r.degree, r.coreness)
        for r in G.kcore(df, rounds=rounds).collect()
    }


CLIQUE_TAIL = (
    [(f"c{i}", f"c{j}") for i in range(4) for j in range(4) if i != j]
    + [("c0", "t1"), ("t1", "t2"), ("t2", "t3")]
)

TRIANGLES = [("a", "b"), ("b", "c"), ("c", "a"),
             ("c", "d"), ("d", "e"), ("e", "c")]


def test_clique_with_tail(spark):
    got = _run(spark, CLIQUE_TAIL)
    want = _ref_coreness(CLIQUE_TAIL)
    assert {n: c for n, (_, c) in got.items()} == want
    # structure sanity: clique nodes coreness 3, tail nodes 1
    assert got["c1"][1] == 3 and got["t3"][1] == 1


def test_two_triangles_shared_node(spark):
    got = _run(spark, TRIANGLES)
    want = _ref_coreness(TRIANGLES)
    assert {n: c for n, (_, c) in got.items()} == want
    assert all(c == 2 for _, c in got.values())


def test_star_and_direction_irrelevance(spark):
    star = [("hub", f"leaf{i}") for i in range(6)]
    got = _run(spark, star)
    want = _ref_coreness(star)
    assert {n: c for n, (_, c) in got.items()} == want
    # reversed + duplicated edges give the same undirected answer
    rev = [(b, a) for a, b in star] + star
    assert _run(spark, rev) == got


def test_mixed_random_graph(spark):
    # deterministic pseudo-random graph: varied coreness levels
    pairs = [
        (f"n{(7 * i) % 13}", f"n{(7 * i + j) % 13}")
        for i in range(13)
        for j in (1, 2, 3)
    ]
    got = _run(spark, pairs, rounds=10)
    want = _ref_coreness(pairs)
    assert {n: c for n, (_, c) in got.items()} == want
