"""label_propagation (operators/graph.py): synchronous weighted LPA with
deterministic min-label tie-break vs a pure-Python replay."""

from collections import defaultdict

from web_crawler_spark.operators import graph as G


def _ref_lpa(edges, rounds):
    wsum = defaultdict(float)
    for u, v, w in edges:
        if u != v:
            wsum[(u, v)] += w
            wsum[(v, u)] += w
    nodes = sorted({a for a, _ in wsum})
    adj = defaultdict(list)
    for (u, v), w in wsum.items():
        adj[u].append((v, w))
    lab = {v: v for v in nodes}
    for _ in range(rounds):
        new = {}
        for v in nodes:
            votes = defaultdict(float)
            for nbv, w in adj[v]:
                votes[lab[nbv]] += w
            new[v] = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        lab = new
    return lab


def _run(spark, edges, rounds):
    df = spark.createDataFrame(edges, ["src_host", "dst_host", "n_links"])
    return {
        r.node: r.label
        for r in G.label_propagation(df, rounds=rounds).collect()
    }


def _clique(prefix, k, w=1.0):
    return [
        (f"{prefix}{i}", f"{prefix}{j}", w)
        for i in range(k) for j in range(i + 1, k)
    ]


def test_two_cliques_with_bridge(spark):
    edges = _clique("a", 4) + _clique("b", 4) + [("a0", "b0", 1.0)]
    got = _run(spark, edges, rounds=4)
    assert got == _ref_lpa(edges, 4)
    # each clique agrees on one community, and they differ
    a_labels = {got[f"a{i}"] for i in range(4)}
    b_labels = {got[f"b{i}"] for i in range(4)}
    assert len(a_labels) == 1 and len(b_labels) == 1
    assert a_labels != b_labels


def test_weights_steer_adoption(spark):
    # x is tied to both cliques by topology; weight decides
    edges = (_clique("a", 3) + _clique("b", 3)
             + [("a0", "x", 5.0), ("b0", "x", 1.0)])
    got = _run(spark, edges, rounds=4)
    assert got == _ref_lpa(edges, 4)


def test_parallel_and_reversed_edges_merge(spark):
    base = [("a", "b", 1.0), ("b", "a", 2.0), ("a", "b", 1.0),
            ("b", "c", 1.0)]
    got = _run(spark, base, rounds=2)
    assert got == _ref_lpa(base, 2)


def test_oscillation_is_deterministic(spark):
    # pure bipartite pair oscillates under synchronous updates: the
    # round-parity result is still a pure function of the graph
    edges = [("p", "q", 1.0)]
    assert _run(spark, edges, rounds=2) == _ref_lpa(edges, 2)
    assert _run(spark, edges, rounds=3) == _ref_lpa(edges, 3)
