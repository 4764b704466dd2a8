"""pagerank_residuals (graph.py): monotone-ish convergence on a simple
graph, zero residual at the symmetric fixpoint, empty graph."""

from web_crawler_spark.operators import graph as G


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1) for a, b in pairs],
        "src_host string, dst_host string, n_links int",
    )


def test_symmetric_cycle_converges_immediately(spark):
    # directed 4-cycle: uniform ranks are already the fixpoint, so every
    # iteration's residual is 0
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    rows = G.pagerank_residuals(_edges(spark, pairs), iterations=3).collect()
    assert [r["l1_residual_micro"] for r in rows] == [0, 0, 0]
    assert [r["iteration"] for r in rows] == [1, 2, 3]


def test_star_graph_residual_decays(spark):
    pairs = [("h", "s1"), ("h", "s2"), ("h", "s3"), ("s1", "h"),
             ("s2", "h"), ("s3", "h")]
    rows = G.pagerank_residuals(_edges(spark, pairs), iterations=8).collect()
    res = [r["l1_residual_micro"] for r in rows]
    assert res[0] > 0
    # damped power iteration: residual contracts by ~the damping factor
    # every round (strictly decreasing, never slower than ~0.9x)
    for a, b in zip(res, res[1:]):
        assert 0 < b < a * 0.9


def test_empty_graph(spark):
    rows = G.pagerank_residuals(
        _edges(spark, []), iterations=3
    ).collect()
    assert rows == []
