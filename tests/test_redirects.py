"""Redirect-chain resolution (operators/redirects): pointer-doubling
semantics — chains, cycles, hop caps, latest-observation dedup, and the
broadcast corpus rewrite."""

from pyspark.sql import functions as F

from web_crawler_spark.operators.redirects import (
    apply_redirects,
    redirect_edges,
    resolve_redirects,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_chain_and_cycle(spark):
    edges = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("c", "d"),  # chain -> terminal d
         ("x", "y"), ("y", "x")],             # 2-cycle
    )
    out = {r["url"]: r for r in resolve_redirects(edges).collect()}
    assert (out["a"]["final_url"], out["a"]["hops"], out["a"]["resolved"]) == ("d", 3, True)
    assert (out["b"]["final_url"], out["b"]["hops"]) == ("d", 2)
    assert out["x"]["resolved"] is False and out["x"]["hops"] == 32
    assert out["x"]["final_url"] in ("x", "y")


def test_long_chain_resolved_within_cap(spark):
    n = 20
    edges = _edges(spark, [(f"u{i}", f"u{i+1}") for i in range(n)])
    out = {r["url"]: r for r in resolve_redirects(edges).collect()}
    assert (out["u0"]["final_url"], out["u0"]["hops"], out["u0"]["resolved"]) == (f"u{n}", n, True)


def test_over_budget_chain_flagged_then_resolved_with_more_rounds(spark):
    n = 40  # longer than the 2^5 = 32 default budget
    edges = _edges(spark, [(f"u{i}", f"u{i+1}") for i in range(n)])
    r5 = {r["url"]: r for r in resolve_redirects(edges, max_rounds=5).collect()}
    assert r5["u0"]["hops"] == 32 and r5["u0"]["resolved"] is False
    r6 = {r["url"]: r for r in resolve_redirects(edges, max_rounds=6).collect()}
    assert (r6["u0"]["final_url"], r6["u0"]["hops"], r6["u0"]["resolved"]) == (f"u{n}", n, True)


def test_redirect_edges_filters_and_dedup(spark):
    rows = [
        ("a", 301, "b", 1.0),
        ("a", 301, "c", 2.0),   # later observation wins with ts_col
        ("t", 200, "zzz", 1.0),  # non-3xx dropped
        ("n", 302, None, 1.0),   # null location dropped
    ]
    f = spark.createDataFrame(
        rows, "url string, status int, redirect_to string, ts double"
    )
    assert {
        (r["src"], r["dst"]) for r in redirect_edges(f, ts_col="ts").collect()
    } == {("a", "c")}
    # without ts: deterministic min(dst)
    assert {
        (r["src"], r["dst"]) for r in redirect_edges(f).collect()
    } == {("a", "b")}


def test_apply_redirects_broadcast_rewrite(spark):
    edges = _edges(spark, [("old", "mid"), ("mid", "new"), ("x", "y"), ("y", "x")])
    resolved = resolve_redirects(edges)
    corpus = spark.createDataFrame(
        [("old", 1), ("keep", 2), ("x", 3)], "url string, v int"
    )
    got = {r["url"]: r["v"] for r in apply_redirects(corpus, resolved).collect()}
    # old -> new (resolved), keep untouched, x untouched (unresolved cycle)
    assert got == {"new": 1, "keep": 2, "x": 3}
    # the mapping side must be broadcast: no shuffle of the corpus
    plan = apply_redirects(corpus, resolved)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_no_vector_of_full_log_joins(spark):
    # pointer doubling: 64-hop budget needs 6 rounds, not 64 joins — assert
    # round count by plan string occurrences of the self-join key alias
    edges = _edges(spark, [("a", "b")])
    df = resolve_redirects(edges, max_rounds=6)
    out = df.collect()
    assert [(r["url"], r["final_url"], r["hops"], r["resolved"]) for r in out] == [
        ("a", "b", 1, True)
    ]


def test_resolve_aliases_composition(spark):
    """Redirect walk + one canonical step composed: chain ends inherit
    the final page's rel=canonical, pages without a declaration (or
    without a fetched html row) are their own effective URL, cycles
    yield resolved=0 with NULL effective."""
    from web_crawler_spark.operators.redirects import resolve_aliases

    fetches = spark.createDataFrame(
        [
            ("https://s.com/a", 301, "https://s.com/b"),
            ("https://s.com/b", 301, "https://s.com/c"),
            ("https://s.com/c", 200, None),
            ("https://s.com/d", 200, None),
            ("https://s.com/e", 302, "https://s.com/e"),  # self-cycle
            ("https://s.com/f", 200, None),
        ],
        "url string, status int, redirect_to string",
    )
    pages = spark.createDataFrame(
        [
            ("https://s.com/c",
             '<html><head><link rel="canonical" href="https://x.com/CANON">'
             "</head><body></body></html>"),
            ("https://s.com/d", "<html><head></head><body></body></html>"),
        ],
        "url string, html string",
    )
    got = {r["url"]: r for r in resolve_aliases(fetches, pages).collect()}
    for u, fin, hops, eff in [
        ("https://s.com/a", "https://s.com/c", 2, "https://x.com/CANON"),
        ("https://s.com/b", "https://s.com/c", 1, "https://x.com/CANON"),
        ("https://s.com/c", "https://s.com/c", 0, "https://x.com/CANON"),
        ("https://s.com/d", "https://s.com/d", 0, "https://s.com/d"),
        ("https://s.com/f", "https://s.com/f", 0, "https://s.com/f"),
    ]:
        r = got[u]
        assert (r["final_url"], r["hops"], r["resolved"], r["effective_url"]) \
            == (fin, hops, 1, eff), u
    e = got["https://s.com/e"]
    assert e["resolved"] == 0 and e["effective_url"] is None
