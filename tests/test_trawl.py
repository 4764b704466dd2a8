"""trawl_cores (operators/graph.py): Kumar et al. bipartite-core trawling
vs a brute-force itertools reference, plus gate semantics."""

from itertools import combinations

from web_crawler_spark.operators import graph as G


def _ref_cores(pairs, j, min_fans):
    """Brute force: count distinct fans per center j-set (no pruning —
    pruning must be output-inert, which this parity asserts)."""
    by_fan = {}
    for f, c in set(pairs):
        by_fan.setdefault(f, set()).add(c)
    counts = {}
    for cs in by_fan.values():
        for combo in combinations(sorted(cs), j):
            counts[combo] = counts.get(combo, 0) + 1
    return {k: v for k, v in counts.items() if v >= min_fans}


def _run(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, ["src_host", "dst_host"])
    rows = G.trawl_cores(df, **kw).collect()
    return {tuple(r["centers"]): r["n_fans"] for r in rows}


def test_planted_core_and_threshold(spark):
    pairs = [(f"f{i}", c) for i in range(4) for c in ("x0", "x1", "x2")]
    pairs += [(f"f{i}", "x3") for i in range(3)]          # 3-fan cores via x3
    pairs += [("w0", c) for c in ("y0", "y1", "y2")]       # 2 fans: below gate
    pairs += [("w1", c) for c in ("y0", "y1", "y2")]
    got = _run(spark, pairs, j=3, min_fans=3)
    assert got[("x0", "x1", "x2")] == 4
    assert got[("x0", "x1", "x3")] == 3
    assert ("y0", "y1", "y2") not in got
    assert got == _ref_cores(pairs, 3, 3)


def test_matches_bruteforce_mixed_graph(spark):
    # deterministic bipartite blob with overlapping center sets
    pairs = []
    for i in range(20):
        for k in range(3 + i % 4):
            pairs.append((f"f{i:02d}", f"c{(i * 5 + k * 7) % 11:02d}"))
    got = _run(spark, pairs, j=3, min_fans=2)
    assert got == _ref_cores(pairs, 3, 2)


def test_max_degree_cap_drops_hub_fans(spark):
    # one hub fan linking 10 centers would mint C(10,3) triples; capped out
    pairs = [("hub", f"c{i}") for i in range(10)]
    pairs += [(f"f{i}", c) for i in range(3) for c in ("c0", "c1", "c2")]
    got = _run(spark, pairs, j=3, min_fans=3, max_degree=5, prune_rounds=0)
    assert got == {("c0", "c1", "c2"): 3}  # hub excluded from the count
    # cap applies to PRUNED degrees: pruning deletes the in-degree-1 centers
    # c3..c9 first, the hub drops to degree 3 and is then legitimately counted
    got2 = _run(spark, pairs, j=3, min_fans=3, max_degree=5)
    assert got2 == {("c0", "c1", "c2"): 4}


def test_j2_matches_cocitation_counts(spark):
    pairs = [(f"f{i}", c) for i in range(5) for c in ("a", "b")]
    pairs += [("f0", "z"), ("f1", "z")]
    got = _run(spark, pairs, j=2, min_fans=2)
    df = None  # related_hosts parity: shared in-linker counts
    import pyspark.sql.functions as F  # noqa: F401

    from web_crawler_spark.operators.graph import related_hosts

    spark_df = spark.createDataFrame(pairs, ["src_host", "dst_host"])
    rel = {
        (r["host_a"], r["host_b"]): r["shared"]
        for r in related_hosts(spark_df, mode="cocitation", min_shared=2).collect()
    }
    assert got == rel == {("a", "b"): 5, ("a", "z"): 2, ("b", "z"): 2}
