"""gr_knn_degree_curve: hand-computed star closed form + registry
consistency."""

import __spark_entry__ as E
from pyspark.sql import functions as F


def test_star_closed_form(spark):
    # star: hub degree 4, spokes degree 1
    # k=1 endpoints: 4 spokes, neighbor degree 4 -> knn = 4
    # k=4 endpoints: hub's 4 edge-sides, neighbor degree 1 -> knn = 1
    from web_crawler_spark.operators import graph as G  # noqa: F401
    e = spark.createDataFrame(
        [(f"s{i}", "hub") for i in range(4)], "a string, b string"
    )
    und = e.select(F.least("a", "b").alias("x"),
                   F.greatest("a", "b").alias("y")).distinct()
    sym = und.unionByName(und.select(F.col("y").alias("x"),
                                     F.col("x").alias("y")))
    deg = sym.groupBy(F.col("x").alias("node")).agg(
        F.count(F.lit(1)).alias("d"))
    j = (sym.join(deg.select(F.col("node").alias("x"),
                             F.col("d").alias("dx")), "x")
         .join(deg.select(F.col("node").alias("y"),
                          F.col("d").alias("dy")), "y"))
    out = {r["dx"]: r for r in j.groupBy("dx").agg(
        F.count(F.lit(1)).alias("n"), F.sum("dy").alias("s")).collect()}
    assert out[1]["n"] == 4 and out[1]["s"] == 16   # knn(1) = 4
    assert out[4]["n"] == 4 and out[4]["s"] == 4    # knn(4) = 1


def test_registry_disassortative_tail(spark):
    rows = E.queries()["gr_knn_degree_curve"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r["knn_milli"] == 1000 * r["sum_nbr_deg"] // r["n_endpoints"]
    # heavy-tail fixture: the highest-degree hub's neighbors are low
    # degree (disassortative), while degree-1 nodes neighbor the hubs
    lo, hi = rows[0], rows[-1]
    assert lo["k"] < hi["k"]
    assert lo["knn_milli"] > hi["knn_milli"]
