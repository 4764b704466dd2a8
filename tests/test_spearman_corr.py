"""gr_pagerank_degree_corr: closed-form Spearman on constructed graphs."""

import pytest

import __spark_entry__ as E
from pyspark.sql import functions as F, Window
from web_crawler_spark.operators import graph as G


def _rho(spark, pairs):
    edges = spark.createDataFrame(
        [(a, b, 1) for a, b in pairs],
        "src_host string, dst_host string, n_links int",
    )
    pr = G.pagerank(edges, iterations=10)
    indeg = edges.groupBy(F.col("dst_host").alias("node")).agg(
        F.count(F.lit(1)).alias("indeg"))
    nodes = pr.join(indeg, "node", "left").select(
        "node", "rank", F.coalesce("indeg", F.lit(0)).alias("indeg"))
    ranked = nodes.select(
        F.row_number().over(Window.orderBy(F.desc("rank"), "node"))
        .alias("a"),
        F.row_number().over(Window.orderBy(F.desc("indeg"), "node"))
        .alias("b"),
    )
    row = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("a") - F.col("b")) * (F.col("a") - F.col("b")))
        .alias("sd2"),
    ).collect()[0]
    n, sd2 = row["n"], row["sd2"]
    return 1.0 - 6.0 * sd2 / (n * (n * n - 1.0))


def test_symmetric_ring_perfect_agreement(spark):
    # directed ring: uniform ranks and uniform in-degrees, both rankings
    # fall back to the node tie-break -> identical orders, rho = 1
    pairs = [(f"n{i}", f"n{(i + 1) % 5}") for i in range(5)]
    assert _rho(spark, pairs) == pytest.approx(1.0, abs=1e-9)


def test_funnel_disagreement(spark):
    # hub has max in-degree but funnels all rank to s0 -> orders differ,
    # rho strictly below 1
    pairs = [(f"s{i}", "hub") for i in range(5)] + [("hub", "s0")]
    assert _rho(spark, pairs) < 1.0


def test_registry_query_runs(spark):
    row = E.queries()["gr_pagerank_degree_corr"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert row["n"] >= 2 and -1.0 <= row["spearman_rho"] <= 1.0
