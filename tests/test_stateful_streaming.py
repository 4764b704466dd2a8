"""Custom stateful streaming operators (applyInPandasWithState): state must
carry ACROSS micro-batches — the thing stateless windows cannot do."""

import time

from pyspark.sql import functions as F


def _start_file_stream_query(spark, src_dir, build, name):
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src_dir)
    )
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    return q


def test_stateful_politeness_across_batches(spark, tmp_path):
    from web_crawler_spark.streaming.stateful import stateful_politeness_schedule

    src = str(tmp_path / "urls_src")
    t0 = "2024-01-01 00:00:00"
    batch1 = spark.createDataFrame(
        [("h.com", "u1", 1, t0), ("h.com", "u2", 2, t0), ("h.com", "u3", 3, t0)],
        "host string, url string, priority int, arrival_ts string",
    ).withColumn("arrival_ts", F.to_timestamp("arrival_ts"))
    batch1.coalesce(1).write.mode("append").parquet(src)

    q = _start_file_stream_query(
        spark, src, lambda s: stateful_politeness_schedule(s, delay_seconds=2.0), "t_pace"
    )
    q.processAllAvailable()

    batch2 = spark.createDataFrame(
        [("h.com", "u4", 1, t0), ("h.com", "u5", 2, t0)],
        "host string, url string, priority int, arrival_ts string",
    ).withColumn("arrival_ts", F.to_timestamp("arrival_ts"))
    batch2.coalesce(1).write.mode("append").parquet(src)
    # file source lists by modification time at second granularity
    time.sleep(1.1)
    q.processAllAvailable()
    q.stop()

    rows = {
        r["url"]: (r["seq"], str(r["scheduled_ts"]))
        for r in spark.sql("select * from t_pace").collect()
    }
    # batch 1: first fetch at arrival, then +2s spacing
    assert rows["u1"] == (1, "2024-01-01 00:00:00")
    assert rows["u2"] == (2, "2024-01-01 00:00:02")
    assert rows["u3"] == (3, "2024-01-01 00:00:04")
    # batch 2 arrives at the same wall time but the host's pacing clock
    # persisted in the state store: scheduling continues at +6s, +8s
    assert rows["u4"] == (4, "2024-01-01 00:00:06")
    assert rows["u5"] == (5, "2024-01-01 00:00:08")


def test_stateful_seen_filter_across_batches(spark, tmp_path):
    from web_crawler_spark.streaming.stateful import stateful_seen_filter

    src = str(tmp_path / "seen_src")
    batch1 = spark.createDataFrame(
        [(1, "https://a.com/1"), (2, "https://a.com/2"), (2, "https://a.com/2")],
        "url_hash long, url string",
    )
    batch1.coalesce(1).write.mode("append").parquet(src)

    q = _start_file_stream_query(spark, src, stateful_seen_filter, "t_seen")
    q.processAllAvailable()

    batch2 = spark.createDataFrame(
        [(2, "https://a.com/2"), (3, "https://a.com/3")],
        "url_hash long, url string",
    )
    batch2.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    q.processAllAvailable()
    q.stop()

    got = sorted(
        (r["url_hash"], r["url"])
        for r in spark.sql("select * from t_seen").collect()
    )
    # each url_hash admitted exactly once across the stream lifetime:
    # within-batch dup of 2 collapsed, cross-batch dup of 2 filtered
    assert got == [(1, "https://a.com/1"), (2, "https://a.com/2"), (3, "https://a.com/3")]


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode windowed aggregation with a watermark: an event arriving
    after the watermark has passed its window must be DROPPED, not merged —
    the bounded-state contract of streaming_market_summary."""
    from web_crawler_spark.streaming import events as SE

    src = str(tmp_path / "late_src")
    batch1 = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", "click", 250.0),
            (2, "2024-01-01 06:00:00", "click", 260.0),  # advances watermark to 04:00
        ],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    batch1.coalesce(1).write.mode("append").parquet(src)
    q = _start_file_stream_query(
        spark, src, lambda s: SE.streaming_market_summary(s, window="1 hour", watermark="2 hours"),
        "t_late",
    )
    q.processAllAvailable()

    batch2 = spark.createDataFrame(
        [(3, "2024-01-01 00:20:00", "click", 240.0)],  # 00:00 window, long past watermark
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    batch2.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    q.processAllAvailable()
    q.stop()

    rows = {str(r["window_start"]): r["n"] for r in spark.sql("select * from t_late").collect()}
    # the 00:00 window finalized with ONLY event 1; the late event 3 was dropped
    assert rows.get("2024-01-01 00:00:00") == 1, rows


def test_stateful_heavy_hitters_across_batches(spark, tmp_path):
    """The MG summary must CARRY across micro-batches: exact regime
    (capacity > distincts) after two batches equals exact counts over the
    concatenated stream — provable only if batch-1 state survived."""
    from web_crawler_spark.streaming.stateful import stateful_heavy_hitters

    src = str(tmp_path / "hh_src")
    b1 = [("a", 3), ("b", 2), ("c", 1)]
    b2 = [("a", 2), ("c", 4), ("d", 1)]

    def frame(counts, seq0):
        rows, seq = [], seq0
        for item, n in counts:
            for _ in range(n):
                rows.append((0, item, seq))
                seq += 1
        return spark.createDataFrame(rows, "shard int, item string, seq int")

    frame(b1, 0).coalesce(1).write.mode("append").parquet(src)
    q = _start_file_stream_query(
        spark,
        src,
        lambda s: stateful_heavy_hitters(s, capacity=16, order_col="seq"),
        "t_hh",
    )
    q.processAllAvailable()
    frame(b2, 100).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("select * from t_hh").collect()
    last = max(r["batch_n"] for r in rows)
    summary = {r["item"]: (r["est"], r["delta"]) for r in rows if r["batch_n"] == last}
    assert summary == {
        "a": (5, 0), "b": (2, 0), "c": (5, 0), "d": (1, 0)
    }  # exact across BOTH batches — state carried
    # batch-1 emission was the partial summary
    first = {r["item"]: r["est"] for r in rows if r["batch_n"] == 1}
    assert first == {"a": 3, "b": 2, "c": 1}


def test_stateful_heavy_hitters_bounded_state(spark, tmp_path):
    """Approximate regime: capacity 2 with 4 distinct items — the summary
    never exceeds capacity, deltas surface, MG bound holds."""
    from web_crawler_spark.streaming.stateful import stateful_heavy_hitters

    src = str(tmp_path / "hh_src2")
    rows = []
    seq = 0
    for item, n in [("x", 6), ("y", 4), ("z", 1), ("w", 1)]:
        for _ in range(n):
            rows.append((0, item, seq))
            seq += 1
    spark.createDataFrame(
        rows, "shard int, item string, seq int"
    ).coalesce(1).write.mode("append").parquet(src)
    q = _start_file_stream_query(
        spark,
        src,
        lambda s: stateful_heavy_hitters(s, capacity=2, order_col="seq"),
        "t_hh2",
    )
    q.processAllAvailable()
    q.stop()
    out = spark.sql("select * from t_hh2").collect()
    assert 0 < len(out) <= 2  # capacity-bounded summary
    truth = {"x": 6, "y": 4, "z": 1, "w": 1}
    delta = out[0]["delta"]
    assert delta > 0
    for r in out:
        assert r["est"] <= truth[r["item"]] <= r["est"] + delta
    # the dominant item is retained
    assert "x" in {r["item"] for r in out}


def _await_sink(spark, table, pred, timeout_s=90.0):
    """Poll a memory-sink table until ``pred(rows)`` holds.

    Needed for the ProcessingTimeTimeout queries: with a processing-time
    timeout configured, ``FlatMapGroupsWithStateExec.shouldRunAnotherBatch``
    is always true, so the stream keeps running no-data micro-batches to
    fire expirations and ``processAllAvailable()`` never returns. Progress
    has to be observed through the sink instead."""
    deadline = time.time() + timeout_s
    rows = []
    while time.time() < deadline:
        rows = spark.sql(f"select * from {table}").collect()
        if pred(rows):
            return rows
        time.sleep(0.5)
    raise AssertionError(f"timed out waiting on {table}; rows={rows}")


def test_seen_filter_ttl_dedups_within_window(spark, tmp_path):
    """Long TTL: behaves exactly like the unbounded seen filter — the
    across-batch duplicate is dropped while its state row is live."""
    from web_crawler_spark.streaming.stateful import stateful_seen_filter_ttl

    src = str(tmp_path / "ttl_src")
    mk = lambda rows: spark.createDataFrame(rows, "url_hash string, url string")
    mk([("h1", "https://a/1"), ("h2", "https://a/2")]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = _start_file_stream_query(
        spark, src, lambda s: stateful_seen_filter_ttl(s, 600.0), "t_ttl1"
    )
    try:
        _await_sink(spark, "t_ttl1", lambda rs: len(rs) >= 2)
        # the dup rides in the SAME file (one micro-batch) as h3, so once
        # h3 is in the sink the h1-dup admission decision has been made
        mk([("h1", "https://a/1-dup"), ("h3", "https://a/3")]).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _await_sink(
            spark, "t_ttl1", lambda rs: any(r["url_hash"] == "h3" for r in rs)
        )
    finally:
        q.stop()
    got = {r["url_hash"]: r["url"] for r in spark.sql("select * from t_ttl1").collect()}
    # h1 admitted ONCE (the batch-1 original), h2+h3 admitted, dup dropped
    assert got == {"h1": "https://a/1", "h2": "https://a/2", "h3": "https://a/3"}


def test_seen_filter_ttl_evicts_and_readmits(spark, tmp_path):
    """Short TTL: after ttl_seconds of inactivity the state row is evicted
    and the SAME key admits again — the recrawl-window semantic (and the
    bounded-state property: expired keys leave the store)."""
    from web_crawler_spark.streaming.stateful import stateful_seen_filter_ttl

    src = str(tmp_path / "ttl_src2")
    mk = lambda rows: spark.createDataFrame(rows, "url_hash string, url string")
    mk([("h1", "https://a/1")]).coalesce(1).write.mode("append").parquet(src)
    q = _start_file_stream_query(
        spark, src, lambda s: stateful_seen_filter_ttl(s, 1.0), "t_ttl2"
    )
    try:
        _await_sink(spark, "t_ttl2", lambda rs: len(rs) >= 1)
        # the 1 s TTL lapses; the stream's own no-data timeout batches
        # process the expiry (that is WHY shouldRunAnotherBatch stays true)
        time.sleep(4.0)
        # h1 returns AFTER eviction -> must be re-admitted
        mk([("h1", "https://a/1-again")]).coalesce(1).write.mode("append").parquet(src)
        _await_sink(
            spark, "t_ttl2", lambda rs: any(r["url"] == "https://a/1-again" for r in rs)
        )
    finally:
        q.stop()
    urls = [r["url"] for r in spark.sql("select * from t_ttl2").collect()]
    assert "https://a/1" in urls
    assert "https://a/1-again" in urls  # the re-admission after eviction


def test_stream_stream_join_window_semantics(spark, tmp_path):
    """Hand dataset: in-window and boundary outlinks join, out-of-window
    and unmatched-source ones don't; single-batch availableNow run equals
    the batch range join row-for-row."""
    import datetime as dt

    from pyspark.sql import functions as F

    from web_crawler_spark.streaming.events import fetch_outlink_join

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    fetches = spark.createDataFrame(
        [("uA", ts(0), 200), ("uB", ts(100), 200)],
        "url string, fetch_ts timestamp, status int",
    )
    outlinks = spark.createDataFrame(
        [
            ("uA", "d1", ts(5)),      # in window
            ("uA", "d2", ts(60)),     # boundary: exactly +60 s, inclusive
            ("uA", "d3", ts(61)),     # out of window
            ("uA", "d4", ts(-1)),     # before the fetch
            ("uB", "d5", ts(130)),    # in window
            ("uZ", "d6", ts(10)),     # no matching fetch
        ],
        "src_url string, dst_url string, discovered_ts timestamp",
    )
    fdir, odir = str(tmp_path / "f"), str(tmp_path / "o")
    fetches.coalesce(1).write.parquet(fdir)
    outlinks.coalesce(1).write.parquet(odir)
    fs = spark.readStream.schema(fetches.schema).parquet(fdir)
    os_ = spark.readStream.schema(outlinks.schema).parquet(odir)
    q = (
        fetch_outlink_join(fs, os_, max_delay_seconds=60)
        .writeStream.format("memory")
        .queryName("ssj_test_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["url"], r["dst_url"])
        for r in spark.table("ssj_test_sink").collect()
    }
    assert got == {("uA", "d1"), ("uA", "d2"), ("uB", "d5")}

    batch = fetch_outlink_join(fetches, outlinks, max_delay_seconds=60)
    assert {(r["url"], r["dst_url"]) for r in batch.collect()} == got
