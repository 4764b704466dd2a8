"""epoch_makespan (operators/aggregate.py): politeness-bound epoch wall
planning — per-host busy time, binding host, shares."""

from pyspark.sql import functions as F

from web_crawler_spark.operators.aggregate import epoch_makespan


def test_makespan_hand_computed(spark):
    frontier = spark.createDataFrame(
        [("a",)] * 10 + [("b",)] * 4 + [("c",)] * 2, "host string"
    )
    delays = spark.createDataFrame(
        [("a", 1000), ("b", 3000), ("c", 2000)], "host string, delay_ms long"
    )
    out = {r["host"]: r for r in epoch_makespan(frontier, delays).collect()}
    # busy: a=10s, b=12s, c=4s -> b binds
    assert out["b"]["is_critical"] and not out["a"]["is_critical"]
    assert out["b"]["host_busy_ms"] == 12000
    assert out["b"]["share_of_epoch_milli"] == 1000
    assert out["a"]["share_of_epoch_milli"] == 1000 * 10000 // 12000
    assert out["c"]["share_of_epoch_milli"] == 1000 * 4000 // 12000


def test_makespan_tie_all_critical(spark):
    frontier = spark.createDataFrame([("a",)] * 2 + [("b",)], "host string")
    delays = spark.createDataFrame(
        [("a", 500), ("b", 1000)], "host string, delay_ms long"
    )
    rows = epoch_makespan(frontier, delays).collect()
    assert all(r["is_critical"] for r in rows)  # both busy 1000 ms


def test_makespan_hosts_without_delay_dropped(spark):
    # inner join contract: a frontier host with no delay row (no robots
    # fetched yet) is absent from the plan rather than silently zeroed
    frontier = spark.createDataFrame([("a",), ("x",)], "host string")
    delays = spark.createDataFrame([("a", 100)], "host string, delay_ms long")
    hosts = {r["host"] for r in epoch_makespan(frontier, delays).collect()}
    assert hosts == {"a"}
