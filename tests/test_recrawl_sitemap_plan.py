"""recrawl_sitemap_plan (operators/snapshots.py): sitemap-delta recrawl
planner — declared staleness priced against observed version history."""

from pyspark.sql import functions as F

from web_crawler_spark.operators.snapshots import recrawl_sitemap_plan


def _hist(spark):
    # u1: two fetches, content changed (2 versions)
    # u2: three fetches, never changed (1 version, 2 wasted)
    # u3: one fetch
    rows = [
        ("https://s.ex/u1", "2025-01-01 00:00:00", "alpha"),
        ("https://s.ex/u1", "2025-01-02 00:00:00", "beta"),
        ("https://s.ex/u2", "2025-01-01 00:00:00", "same"),
        ("https://s.ex/u2", "2025-01-02 00:00:00", "same"),
        ("https://s.ex/u2", "2025-01-03 00:00:00", "same"),
        ("https://s.ex/u3", "2025-01-01 00:00:00", "solo"),
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts string, text string"
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))


def _entries(spark):
    rows = [
        # stale by 1 day for u1 (2 versions -> boosted) and u2 (1 version)
        ("https://s.ex/u1", "2025-01-03 00:00:00"),
        ("https://s.ex/u2", "2025-01-04 00:00:00"),
        # u3: lastmod BEFORE capture -> not a candidate
        ("https://s.ex/u3", "2024-12-25"),
        # never captured -> new
        ("https://s.ex/brand-new", "2025-01-01"),
    ]
    return spark.createDataFrame(rows, "loc string, lastmod string")


def test_plan_hand_computed(spark):
    out = {r["url"]: r for r in
           recrawl_sitemap_plan(_hist(spark), _entries(spark)).collect()}
    assert set(out) == {
        "https://s.ex/u1", "https://s.ex/u2", "https://s.ex/brand-new"
    }
    new = out["https://s.ex/brand-new"]
    assert new["reason"] == "new"
    assert new["n_versions"] == 0 and new["wasted_fetches"] == 0
    assert new["priority_milli"] == 1_000_000

    u1 = out["https://s.ex/u1"]  # 86400 s stale, 2 versions -> 1.25x boost
    assert u1["reason"] == "stale"
    assert u1["n_versions"] == 2 and u1["wasted_fetches"] == 0
    assert u1["staleness_sec"] == 86400
    assert u1["priority_milli"] == 86400 * 1250 // 1000  # 108000

    u2 = out["https://s.ex/u2"]  # 86400 s stale, 1 version -> no boost
    assert u2["n_versions"] == 1 and u2["wasted_fetches"] == 2
    assert u2["priority_milli"] == 86400


def test_demonstrated_churn_outranks_declare_only(spark):
    out = {r["url"]: r["priority_milli"] for r in
           recrawl_sitemap_plan(_hist(spark), _entries(spark)).collect()}
    # equal declared staleness (1 day each): the 2-version URL wins
    assert out["https://s.ex/u1"] > out["https://s.ex/u2"]


def test_malformed_and_older_lastmod_not_planned(spark):
    entries = spark.createDataFrame(
        [("https://s.ex/u1", "not-a-date"), ("https://s.ex/u2", None)],
        "loc string, lastmod string",
    )
    assert recrawl_sitemap_plan(_hist(spark), entries).count() == 0
