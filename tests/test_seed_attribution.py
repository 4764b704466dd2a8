"""seed_attribution (graph.py): min-(depth, seed) provenance — subtree
flip, equidistant tie-break, depth cap, unreachable absence."""

from web_crawler_spark.operators import graph as G


def _run(spark, pairs, seeds, max_depth=8):
    e = spark.createDataFrame(pairs, "src_host string, dst_host string")
    s = spark.createDataFrame([(x,) for x in seeds], "node string")
    return {
        r["node"]: (r["depth"], r["seed"])
        for r in G.seed_attribution(e, s, max_depth=max_depth).collect()
    }


def test_nearest_seed_wins(spark):
    # s1 - a - b - c;  s9 - c  => c is s9's (depth 1 beats depth 3)
    pairs = [("s1", "a"), ("a", "b"), ("b", "c"), ("s9", "c")]
    out = _run(spark, pairs, ["s1", "s9"])
    assert out["a"] == (1, "s1") and out["b"] == (2, "s1")
    assert out["c"] == (1, "s9")
    assert out["s1"] == (0, "s1") and out["s9"] == (0, "s9")


def test_equidistant_tie_breaks_to_min_seed(spark):
    pairs = [("s1", "x"), ("s9", "x")]
    out = _run(spark, pairs, ["s1", "s9"])
    assert out["x"] == (1, "s1")


def test_tie_break_through_deeper_layers(spark):
    # both seeds reach y at depth 2 through different relays
    pairs = [("s1", "r1"), ("r1", "y"), ("s9", "r9"), ("r9", "y")]
    out = _run(spark, pairs, ["s1", "s9"])
    assert out["y"] == (2, "s1")


def test_depth_cap_and_unreachable(spark):
    chain = [(f"c{i}", f"c{i+1}") for i in range(6)]
    pairs = chain + [("z1", "z2")]
    out = _run(spark, pairs, ["c0"], max_depth=3)
    assert out["c3"] == (3, "c0")
    assert "c4" not in out and "z1" not in out and "z2" not in out
