"""frontier_starvation (operators/aggregate.py): trailing-streak audit
vs hand-computed fixtures — streak breaking by service AND by empty
queue, late joiners, never-served hosts, hosts absent at the final
epoch."""

from web_crawler_spark.operators import aggregate as AG


def _run(spark, demand, fetches):
    d = spark.createDataFrame(demand, "host string, epoch long, n_queued long")
    f = spark.createDataFrame(fetches, "host string, epoch long, n_fetched long")
    return {
        r.host: (r.epochs_starved, r.first_starved_epoch, r.queued_now)
        for r in AG.frontier_starvation(d, f).collect()
    }


def test_streaks_and_breaks(spark):
    demand = (
        [("served", e, 10) for e in range(4)]
        + [("tail2", e, 5) for e in range(4)]
        + [("never", e, 7) for e in range(4)]
        # queue drained to 0 at epoch 2 breaks the streak even with no fetch
        + [("drained", 0, 3), ("drained", 1, 3), ("drained", 2, 0),
           ("drained", 3, 3)]
    )
    fetches = (
        [("served", e, 1) for e in range(4)]
        + [("tail2", 0, 1), ("tail2", 1, 1)]
    )
    got = _run(spark, demand, fetches)
    assert got == {
        "tail2": (2, 2, 5),
        "never": (4, 0, 7),
        "drained": (1, 3, 3),
    }


def test_late_joiner_and_absent_at_end(spark):
    demand = (
        [("anchor", e, 1) for e in range(5)]     # defines global E=4, served
        + [("late", 3, 9), ("late", 4, 9)]       # joined at epoch 3, never served
        + [("gone", 0, 9), ("gone", 1, 9)]       # left frontier before E
    )
    fetches = [("anchor", e, 1) for e in range(5)]
    got = _run(spark, demand, fetches)
    assert got == {"late": (2, 3, 9)}            # gone: no row at E -> no report


def test_zero_fetch_row_counts_as_starved(spark):
    demand = [("h", 0, 4), ("h", 1, 4)]
    fetches = [("h", 0, 1), ("h", 1, 0)]         # explicit zero row at E
    assert _run(spark, demand, fetches) == {"h": (1, 1, 4)}
