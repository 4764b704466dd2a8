"""path_prefix_rollup (operators/urlfilter.py): hierarchical directory
census — counts, shares, depth capping, query/fragment stripping."""

from web_crawler_spark.operators import urlfilter as UF


def test_rollup_hand_computed(spark):
    rows = [
        ("https://h.com/a/x/1",),
        ("https://h.com/a/x/2",),
        ("https://h.com/a/y/1",),
        ("https://h.com/b/1",),
        ("https://h.com/top",),
    ]
    df = spark.createDataFrame(rows, "url string")
    out = {(r["depth"], r["prefix"]): r
           for r in UF.path_prefix_rollup(df, max_depth=2).collect()}
    assert out[(1, "/a")]["n_urls"] == 3
    assert out[(1, "/a")]["share_milli"] == 600  # 3/5
    assert out[(2, "/a/x")]["n_urls"] == 2
    assert out[(2, "/a/y")]["n_urls"] == 1
    assert out[(1, "/b")]["n_urls"] == 1
    assert out[(1, "/top")]["n_urls"] == 1  # leaf counts as its own node
    assert (3, "/a/x/1") not in out  # max_depth=2 caps the explode
    assert all(r["host_urls"] == 5 for r in out.values())


def test_rollup_ignores_query_fragment_and_rootless(spark):
    rows = [
        ("https://h.com/a/p?sid=1#frag",),
        ("https://h.com/",),          # root only: no path segments
        ("not-a-url",),
    ]
    df = spark.createDataFrame(rows, "url string")
    out = UF.path_prefix_rollup(df).collect()
    assert {(r["depth"], r["prefix"]) for r in out} == {(1, "/a"), (2, "/a/p")}
    # query/fragment never leak into the prefix
    assert all("?" not in r["prefix"] and "#" not in r["prefix"] for r in out)
    # host mass counts only path-bearing URLs
    assert all(r["host_urls"] == 1 for r in out)


def test_rollup_separates_hosts(spark):
    rows = [("https://a.com/x/1",), ("https://b.com/x/1",)]
    df = spark.createDataFrame(rows, "url string")
    out = UF.path_prefix_rollup(df, max_depth=1).collect()
    assert {(r["host"], r["prefix"]) for r in out} == {
        ("a.com", "/x"), ("b.com", "/x")
    }
    assert all(r["share_milli"] == 1000 for r in out)
