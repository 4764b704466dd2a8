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


def test_host_latency_slo_discrete_quantiles(spark):
    from web_crawler_spark.operators import politeness as PL

    rows = (
        [("fast", v) for v in [10, 20, 30, 40, 50, 60, 70, 80, 90, 100]]
        + [("tail", v) for v in [10, 10, 10, 10, 10, 10, 10, 10, 10, 5000]]
        + [("one", 7)]
    )
    df = spark.createDataFrame(rows, "host string, latency_ms long")
    got = {
        r.host: (r.n_fetches, r.p50_ms, r.p95_ms, r.p99_ms, r.slo_breach)
        for r in PL.host_latency_slo(df, slo_p95_ms=2000).collect()
    }
    # n=10: p50 -> rank ceil(5.0)=5, p95/p99 -> ceil(9.5)/ceil(9.9)=10
    assert got["fast"] == (10, 50, 100, 100, False)
    assert got["tail"] == (10, 10, 5000, 5000, True)
    assert got["one"] == (1, 7, 7, 7, False)


def test_write_layout_plan_classes(spark):
    from web_crawler_spark.operators import corpus as CO

    rows = (
        [(f"big{i}", "bulk", "x" * 1000) for i in range(50)]     # 50 KB
        + [(f"mid{i}", "mid", "y" * 1000) for i in range(8)]     # 8 KB
        + [("t1", "dust", "z" * 100)]                            # 100 B
    )
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    got = {
        r.partition_key: (r.n_rows, r.est_bytes, r.n_files,
                          r.rows_per_file, r.layout_class)
        for r in CO.write_layout_plan(
            df, key_col="source", target_file_bytes=4000,
            max_files_per_key=4,
        ).collect()
    }
    assert got == {
        "bulk": (50, 50000, 4, 13, "capped"),     # 13 files wanted, cap 4
        "mid": (8, 8000, 2, 4, "balanced"),
        "dust": (1, 100, 1, 1, "tiny"),
    }
