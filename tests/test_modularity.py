"""community_modularity (operators/graph.py): closed-form Newman-Girvan
values and invariants."""

from web_crawler_spark.operators import graph as G


def _run(spark, pairs, labels):
    e = spark.createDataFrame(pairs, ["src_host", "dst_host"])
    l = spark.createDataFrame(list(labels.items()), ["node", "label"])
    rows = G.community_modularity(e, l).collect()
    return {r["label"]: r for r in rows}


def test_two_triangles_q_quarter_each(spark):
    pairs = [("a0", "a1"), ("a1", "a2"), ("a2", "a0"),
             ("b0", "b1"), ("b1", "b2"), ("b2", "b0")]
    labels = {n: n[0] for n in "a0 a1 a2 b0 b1 b2".split()}
    got = _run(spark, pairs, labels)
    for c in ("a", "b"):
        assert got[c]["n_nodes"] == 3
        assert got[c]["intra2_w"] == 6       # 2 * 3 intra edges
        assert got[c]["deg_w"] == 6
        assert abs(got[c]["q_contrib"] - 0.25) < 1e-12
    assert abs(sum(r["q_contrib"] for r in got.values()) - 0.5) < 1e-12


def test_single_community_q_zero(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "a")]
    got = _run(spark, pairs, {"a": "x", "b": "x", "c": "x"})
    assert abs(got["x"]["q_contrib"]) < 1e-15


def test_bad_split_negative_contribution(spark):
    # a single edge split across two communities: e_c=0, each d_c=1, m=1
    got = _run(spark, [("a", "b")], {"a": "A", "b": "B"})
    for c in ("A", "B"):
        assert got[c]["intra2_w"] == 0
        assert abs(got[c]["q_contrib"] - (0.0 - 0.25)) < 1e-12


def test_weighted_multiplicity_counts(spark):
    # duplicate rows are multiplicity: double edge inside, single out
    pairs = [("a", "b"), ("a", "b"), ("b", "c")]
    got = _run(spark, pairs, {"a": "i", "b": "i", "c": "o"})
    assert got["i"]["intra2_w"] == 4          # 2 * weight-2 edge
    assert got["i"]["deg_w"] == 5             # a:2 + b:3
    assert got["o"]["deg_w"] == 1
