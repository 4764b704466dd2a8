"""version_intervals (operators/snapshots.py): SCD-2 content-version
validity intervals over the crawl history."""

import datetime as dt

from web_crawler_spark.operators import snapshots as SN


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_intervals_hand_computed(spark):
    rows = [
        # u1: A A B A -> 3 versions (A x2 fetches, B, A again = new version)
        ("u1", _ts("2025-01-01T00:00:00"), "A"),
        ("u1", _ts("2025-01-01T01:00:00"), "A"),
        ("u1", _ts("2025-01-01T02:00:00"), "B"),
        ("u1", _ts("2025-01-01T03:00:00"), "A"),
        # u2: single fetch
        ("u2", _ts("2025-01-01T00:30:00"), "Z"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    out = SN.version_intervals(df).collect()
    u1 = sorted((r for r in out if r["key"] == "u1"),
                key=lambda r: r["version_id"])
    assert [r["version_id"] for r in u1] == [1, 2, 3]
    assert [r["n_fetches"] for r in u1] == [2, 1, 1]
    # half-open intervals chain exactly: v1 ends where v2 begins
    assert u1[0]["valid_to"] == u1[1]["valid_from"]
    assert u1[1]["valid_to"] == u1[2]["valid_from"]
    assert u1[2]["valid_to"] is None and u1[2]["is_current"]
    assert not u1[0]["is_current"] and not u1[1]["is_current"]
    # content returning to an old fingerprint is a NEW version (SCD-2,
    # not content dedup): v1 and v3 share the fingerprint
    assert u1[0]["fingerprint"] == u1[2]["fingerprint"]
    u2 = [r for r in out if r["key"] == "u2"]
    assert len(u2) == 1 and u2[0]["is_current"] and u2[0]["n_fetches"] == 1


def test_asof_lookup_range_semantics(spark):
    rows = [
        ("u1", _ts("2025-01-01T00:00:00"), "A"),
        ("u1", _ts("2025-01-01T02:00:00"), "B"),
    ]
    hist = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    iv = SN.version_intervals(hist)
    probes = spark.createDataFrame(
        [
            ("u1", _ts("2024-12-31T23:00:00"), 0),  # before first: no row
            ("u1", _ts("2025-01-01T01:00:00"), 1),  # inside v1
            ("u1", _ts("2025-01-01T02:00:00"), 2),  # boundary: v2 (half-open)
            ("u1", _ts("2025-01-01T09:00:00"), 3),  # current version
            ("zz", _ts("2025-01-01T01:00:00"), 4),  # never crawled: no row
        ],
        "key string, ts timestamp, probe_id long",
    )
    out = {r["probe_id"]: r for r in SN.asof_lookup(iv, probes).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["version_id"] == 1
    assert out[2]["version_id"] == 2  # valid_from inclusive, valid_to exclusive
    assert out[3]["version_id"] == 2 and out[3]["is_current"]


def test_intervals_reconcile_with_change_detection(spark):
    rows = [
        ("u", _ts("2025-01-01T00:00:00"), f"body rev{int(i // 3)}")
        for i, _ in enumerate(range(9))
    ]
    rows = [(u, t + dt.timedelta(minutes=i), x)
            for i, (u, t, x) in enumerate(rows)]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    chain = SN.change_detection(df)
    n_versions = chain.filter("changed").count()
    iv = SN.version_intervals(df)
    assert iv.count() == n_versions
    # total fetches conserved across versions
    assert sum(r["n_fetches"] for r in iv.collect()) == chain.count()
