"""scc / bowtie (operators/graph.py): coloring-algorithm SCCs vs an exact
pure-Python Tarjan reference, and Broder bow-tie parts on hand graphs."""

from web_crawler_spark.operators import graph as G


def _tarjan(pairs):
    """Iterative Tarjan; returns {node: lexicographic-min member of its SCC}."""
    adj = {}
    nodes = set()
    for u, v in pairs:
        nodes.add(u)
        nodes.add(v)
        if u != v:
            adj.setdefault(u, []).append(v)
    index, low, onstack = {}, {}, set()
    stack, sccs, counter = [], [], [0]
    for start in sorted(nodes):
        if start in index:
            continue
        work = [(start, iter(adj.get(start, ())))]
        while work:
            v, it = work[-1]
            if v not in index:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                onstack.add(v)
            advanced = False
            for w in it:
                if w not in index:
                    work.append((w, iter(adj.get(w, ()))))
                    advanced = True
                    break
                if w in onstack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    onstack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                sccs.append(comp)
    out = {}
    for comp in sccs:
        rep = min(comp)
        for n in comp:
            out[n] = rep
    return out


def _run_scc(spark, pairs):
    df = spark.createDataFrame(pairs, ["src_host", "dst_host"])
    rows = G.scc(df).collect()
    return {r["node"]: (r["scc_id"], r["scc_size"]) for r in rows}


def test_scc_cycle_plus_chain(spark):
    # 3-cycle a->b->c->a with a chain c->d->e hanging off
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    got = _run_scc(spark, pairs)
    assert got == {
        "a": ("a", 3),
        "b": ("a", 3),
        "c": ("a", 3),
        "d": ("d", 1),
        "e": ("e", 1),
    }


def test_scc_two_cycles_bridge(spark):
    # two 2-cycles joined by a one-way bridge stay separate SCCs
    pairs = [("p", "q"), ("q", "p"), ("q", "x"), ("x", "y"), ("y", "x")]
    got = _run_scc(spark, pairs)
    assert got["p"] == ("p", 2) and got["q"] == ("p", 2)
    assert got["x"] == ("x", 2) and got["y"] == ("x", 2)


def test_scc_self_loop_is_singleton(spark):
    pairs = [("a", "a"), ("a", "b")]
    got = _run_scc(spark, pairs)
    assert got == {"a": ("a", 1), "b": ("b", 1)}


def test_scc_matches_tarjan_on_mixed_graph(spark):
    # deterministic pseudo-random digraph: dense enough for nested SCCs
    pairs = []
    n = 40
    for i in range(n):
        pairs.append((f"n{i:02d}", f"n{(i * 7 + 3) % n:02d}"))
        pairs.append((f"n{i:02d}", f"n{(i * 13 + 1) % n:02d}"))
        if i % 3 == 0:
            pairs.append((f"n{(i * 5) % n:02d}", f"n{i:02d}"))
    want = _tarjan(pairs)
    got = _run_scc(spark, pairs)
    assert {k: v[0] for k, v in got.items()} == want
    # sizes consistent with the reference partition
    from collections import Counter

    sizes = Counter(want.values())
    for node, (rep, size) in got.items():
        assert size == sizes[rep]


def test_scc_rounds_telemetry(spark):
    _run_scc(spark, [("a", "b"), ("b", "a")])
    assert G.LAST_SCC_STATS["outer_rounds"] >= 1
    assert all(r >= 1 for r in G.LAST_SCC_STATS["color_rounds"])


def test_bowtie_parts(spark):
    # CORE = {c0,c1,c2}; IN chain i0->i1->c0; OUT c1->o0->o1;
    # TUBE i1->t0->o1 (bypasses core); TENDRIL i0->u0; DISC d0<->d1
    pairs = [
        ("c0", "c1"), ("c1", "c2"), ("c2", "c0"),
        ("i0", "i1"), ("i1", "c0"),
        ("c1", "o0"), ("o0", "o1"),
        ("i1", "t0"), ("t0", "o1"),
        ("i0", "u0"),
        ("d0", "d1"), ("d1", "d0"),
    ]
    df = spark.createDataFrame(pairs, ["src_host", "dst_host"])
    got = {r["node"]: r["part"] for r in G.bowtie(df).collect()}
    assert got == {
        "c0": "CORE", "c1": "CORE", "c2": "CORE",
        "i0": "IN", "i1": "IN",
        "o0": "OUT", "o1": "OUT",
        "t0": "TUBE",
        "u0": "TENDRIL",
        "d0": "DISC", "d1": "DISC",
    }


def test_bowtie_core_tiebreak_min_scc_id(spark):
    # two 2-cycles, no edges between: largest-SCC tie broken by min scc_id
    pairs = [("b0", "b1"), ("b1", "b0"), ("a0", "a1"), ("a1", "a0")]
    df = spark.createDataFrame(pairs, ["src_host", "dst_host"])
    got = {r["node"]: r["part"] for r in G.bowtie(df).collect()}
    assert got["a0"] == "CORE" and got["a1"] == "CORE"
    assert got["b0"] == "DISC" and got["b1"] == "DISC"
