"""Pagination-chain assembly (operators/pagination.py): rel=next link
extraction, prev-pointer chain rooting, in-order text reassembly, cycle
exclusion, gap splitting."""

from web_crawler_spark.operators.pagination import (
    assemble_articles,
    pagination_edges,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, ["url", "html", "text"])


def _by_article(df):
    return {
        r.article_url: (r.n_pages, r.full_text) for r in df.collect()
    }


def test_three_page_chain_mixed_attr_orders_and_relative_hrefs(spark):
    pages = _pages(spark, [
        ("https://s.com/a/p1",
         '<head><link rel="next" href="p2"></head>', "one"),
        ("https://s.com/a/p2",
         "<head><link href='/a/p3' rel='next'></head>", "two"),
        ("https://s.com/a/p3", "<head></head>", "three"),
    ])
    out = _by_article(assemble_articles(pages))
    assert out == {"https://s.com/a/p1": (3, "one\ntwo\nthree")}


def test_edges_extraction_boundaries(spark):
    pages = _pages(spark, [
        # rel token must not prefix-match
        ("https://s.com/x", '<link rel="nextdoor" href="/no">', "t"),
        # unquoted rel
        ("https://s.com/y", "<link rel=next href=/yes>", "t"),
        # body <a rel=next> is NOT the head signal this operator reads
        ("https://s.com/z", '<a rel="next" href="/no2">more</a>', "t"),
    ])
    got = {(r.src, r.dst) for r in pagination_edges(pages).collect()}
    assert got == {("https://s.com/y", "https://s.com/yes")}


def test_cycle_excluded_entirely(spark):
    pages = _pages(spark, [
        ("https://c.com/a", '<link rel="next" href="/b">', "a"),
        ("https://c.com/b", '<link rel="next" href="/a">', "b"),
        ("https://c.com/solo", "<p>no links</p>", "s"),
    ])
    out = _by_article(assemble_articles(pages))
    assert out == {"https://c.com/solo": (1, "s")}


def test_gap_splits_chain(spark):
    # p2 was never crawled: p1 stands alone, p3 starts a fresh chain
    pages = _pages(spark, [
        ("https://g.com/p1", '<link rel="next" href="/p2">', "one"),
        ("https://g.com/p3", '<link rel="next" href="/p4">', "three"),
        ("https://g.com/p4", "", "four"),
    ])
    out = _by_article(assemble_articles(pages))
    assert out == {
        "https://g.com/p1": (1, "one"),
        "https://g.com/p3": (2, "three\nfour"),
    }


def test_fork_is_deterministic(spark):
    # two pages claim the same successor: min(src) wins the chain,
    # the loser becomes its own single-page article
    pages = _pages(spark, [
        ("https://f.com/x1", '<link rel="next" href="/z">', "x1"),
        ("https://f.com/x2", '<link rel="next" href="/z">', "x2"),
        ("https://f.com/z", "", "z"),
    ])
    out = _by_article(assemble_articles(pages))
    assert out == {
        "https://f.com/x1": (2, "x1\nz"),
        "https://f.com/x2": (1, "x2"),
    }


def test_self_next_ignored(spark):
    pages = _pages(spark, [
        ("https://s.com/p", '<link rel="next" href="/p">', "p"),
    ])
    out = _by_article(assemble_articles(pages))
    assert out == {"https://s.com/p": (1, "p")}
