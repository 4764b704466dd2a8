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


def test_makespan_hosts_without_delay_stay_visible(spark):
    # visibility contract: a frontier host with no delay row (no robots
    # fetched yet) keeps its row with NULL delay/busy/share — an
    # incomplete delay table must be SEEN in the plan, never silently
    # shrink the makespan bound
    frontier = spark.createDataFrame([("a",), ("x",)], "host string")
    delays = spark.createDataFrame([("a", 100)], "host string, delay_ms long")
    out = {r["host"]: r for r in epoch_makespan(frontier, delays).collect()}
    assert set(out) == {"a", "x"}
    assert out["x"]["delay_ms"] is None
    assert out["x"]["host_busy_ms"] is None
    assert out["x"]["share_of_epoch_milli"] is None
    assert out["x"]["is_critical"] is False
    assert out["a"]["is_critical"] is True  # bound over known hosts only


def test_makespan_default_delay_fills_missing_hosts(spark):
    frontier = spark.createDataFrame(
        [("a",)] * 2 + [("x",)] * 5, "host string"
    )
    delays = spark.createDataFrame([("a", 100)], "host string, delay_ms long")
    out = {
        r["host"]: r
        for r in epoch_makespan(
            frontier, delays, default_delay_ms=300
        ).collect()
    }
    assert out["x"]["delay_ms"] == 300
    assert out["x"]["host_busy_ms"] == 1500  # 5 urls x 300 ms
    assert out["x"]["is_critical"] is True  # 1500 > a's 200


def test_makespan_zero_bound_defines_share(spark):
    # all delays 0: busy == makespan == 0 for every host — share is the
    # defined 1000 (busy equals the bound), not a 0/0 NULL
    frontier = spark.createDataFrame([("a",), ("b",)], "host string")
    delays = spark.createDataFrame(
        [("a", 0), ("b", 0)], "host string, delay_ms long"
    )
    for r in epoch_makespan(frontier, delays).collect():
        assert r["share_of_epoch_milli"] == 1000
        assert r["is_critical"] is True
