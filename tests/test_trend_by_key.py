"""trend_by_key (operators/aggregate.py): closed-form per-key OLS from
integer sums — exact slopes on noiseless lines, degenerate x, single
points, fixed-point flooring."""

from web_crawler_spark.operators import aggregate as AG


def _run(spark, rows):
    df = spark.createDataFrame(rows, "host string, epoch long, quality long")
    return {
        r.host: (r.n_points, r.mean_y_milli, r.slope_milli)
        for r in AG.trend_by_key(df).collect()
    }


def test_exact_lines_and_degenerates(spark):
    rows = (
        [("up", x, 7 + 3 * x) for x in range(5)]        # slope 3
        + [("down", x, 100 - 2 * x) for x in range(4)]  # slope -2
        + [("flat", x, 42) for x in range(3)]           # slope 0
        + [("vert", 5, 1), ("vert", 5, 9)]              # all x equal
        + [("single", 0, 10)]
    )
    got = _run(spark, rows)
    assert got["up"] == (5, 13000, 3000)
    assert got["down"] == (4, 97000, -2000)
    assert got["flat"] == (3, 42000, 0)
    assert got["vert"] == (2, 5000, None)
    assert got["single"] == (1, 10000, None)


def test_floor_semantics_on_fractional_slope(spark):
    # points (0,0), (1,0), (2,1): slope = 1/2 -> 500 milli
    rows = [("h", 0, 0), ("h", 1, 0), ("h", 2, 1)]
    got = _run(spark, rows)
    assert got["h"] == (3, 333, 500)
    # negative fractional slope floors toward -inf: (0,1),(1,1),(2,0)
    rows2 = [("g", 0, 1), ("g", 1, 1), ("g", 2, 0)]
    assert _run(spark, rows2)["g"] == (3, 666, -500)
