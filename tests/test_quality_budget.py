"""quality_capped_allocation (operators/aggregate.py): demand x politeness
capacity x Wilson-demoted health weights -> per-host epoch budget."""

from web_crawler_spark.operators.aggregate import quality_capped_allocation


def _frames(spark):
    frontier = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 50 + [("c",)] * 5 + [("x",)] * 50,
        "host string",
    )
    delays = spark.createDataFrame(
        # a: cap 60000/2000 = 30; b: 20; c: 30; x has NO delay row
        [("a", 2000), ("b", 3000), ("c", 2000)],
        "host string, delay_ms long",
    )
    fetches = spark.createDataFrame(
        # a: clean 0/100; b: 50/100 errors -> demoted; c: no history
        [("a", False)] * 100 + [("b", True)] * 50 + [("b", False)] * 50,
        "host string, is_error boolean",
    )
    return frontier, delays, fetches


def test_allocation_hand_computed(spark):
    frontier, delays, fetches = _frames(spark)
    out = {r["host"]: r for r in quality_capped_allocation(
        frontier, delays, fetches, total_budget=60, epoch_ms=60_000
    ).collect()}
    # weights: a = 1000 (wilson_lb 0), c = 1000 (no history), b demoted
    assert out["a"]["weight_milli"] == 1000
    assert out["c"]["weight_milli"] == 1000
    assert out["b"]["weight_milli"] < 700  # 50% errors over 100 fetches
    # x: no delay row -> visible with NULL cap and budget 0
    assert out["x"]["cap_politeness"] is None
    assert out["x"]["budget"] == 0
    assert out["x"]["n_demand"] == 50
    # c: demand 5 binds (share and cap are larger)
    assert out["c"]["budget"] == 5
    # a: share = floor(60 * 1000 / sum_w) with sum_w = 2000 + b's weight
    sum_w = 2000 + out["b"]["weight_milli"]
    assert out["a"]["budget"] == min(50, 30, 60 * 1000 // sum_w)
    # b: politeness cap 20 vs its demoted share
    assert out["b"]["budget"] == min(
        50, 20, 60 * out["b"]["weight_milli"] // sum_w
    )
    # the ledger never overspends
    assert sum(r["budget"] for r in out.values()) <= 60


def test_zero_delay_means_unbounded_cap(spark):
    frontier = spark.createDataFrame([("a",)] * 9, "host string")
    delays = spark.createDataFrame([("a", 0)], "host string, delay_ms long")
    fetches = spark.createDataFrame([("a", False)], "host string, is_error boolean")
    out = quality_capped_allocation(
        frontier, delays, fetches, total_budget=100, epoch_ms=1000
    ).collect()[0]
    assert out["cap_politeness"] == 9  # demand-bounded, not politeness
    assert out["budget"] == 9


def test_fully_failing_host_keeps_minimal_weight(spark):
    # p=1 over huge n: the Wilson lower bound approaches but never
    # reaches 1, so the weight floors at 1 per-mille, not 0 — a totally
    # dead host keeps a token share instead of being starved forever
    # (the probe fetch that would detect recovery stays fundable)
    frontier = spark.createDataFrame([("a",)] * 3, "host string")
    delays = spark.createDataFrame([("a", 100)], "host string, delay_ms long")
    fetches = spark.createDataFrame(
        [("a", True)] * 100000, "host string, is_error boolean"
    )
    out = quality_capped_allocation(
        frontier, delays, fetches, total_budget=10, epoch_ms=1000
    ).collect()[0]
    assert out["weight_milli"] == 1
    assert out["budget"] == 3  # share floor(10*1/1)=10, demand 3 binds


def test_no_delay_table_at_all_no_division_by_zero(spark):
    # every frontier host missing its delay row: the capacity-known set
    # is empty, the weight sum is NULL, and the allocator must emit all
    # zero budgets instead of dividing by zero
    frontier = spark.createDataFrame([("a",), ("b",)], "host string")
    delays = spark.createDataFrame([], "host string, delay_ms long")
    fetches = spark.createDataFrame([("a", False)], "host string, is_error boolean")
    rows = quality_capped_allocation(
        frontier, delays, fetches, total_budget=10, epoch_ms=1000
    ).collect()
    assert len(rows) == 2
    assert all(r["budget"] == 0 and r["cap_politeness"] is None for r in rows)
