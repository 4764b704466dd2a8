"""hreflang variant clustering (operators/hreflang.py): declaration
extraction (attribute-order-independent, token-safe rel match), partial
declarations closed transitively, singletons, x-default handling."""

from web_crawler_spark.operators.hreflang import (
    hreflang_clusters,
    hreflang_edges,
    hreflang_reciprocity,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, ["url", "html"])


def test_edges_attribute_orders_and_resolution(spark):
    pages = _pages(spark, [
        ("https://s.com/en/a",
         '<head><link rel="alternate" hreflang="FR" href="/fr/a">'
         "<link hreflang='de' href='https://s.com/de/a' rel='alternate'>"
         '<link rel="alternate stylesheet" hreflang="es" href="/es/a">'
         '<link rel="alternate" href="/no-lang">'
         '<link rel="stylesheet" hreflang="it" href="/style.css"></head>',
         ),
    ])
    got = {(r.lang, r.variant_url) for r in hreflang_edges(pages).collect()}
    # FR lowercased; multi-token rel ("alternate stylesheet") still counts
    # as alternate; no hreflang → dropped; rel=stylesheet → dropped
    assert got == {
        ("fr", "https://s.com/fr/a"),
        ("de", "https://s.com/de/a"),
        ("es", "https://s.com/es/a"),
    }


def test_partial_declaration_closes_cluster(spark):
    # only the en page declares; fr/de silent — transitive closure still
    # groups all three; n_langs counts declared tags incl. x-default
    pages = _pages(spark, [
        ("https://s.com/en/a",
         '<link rel="alternate" hreflang="fr" href="/fr/a">'
         '<link rel="alternate" hreflang="de" href="/de/a">'
         '<link rel="alternate" hreflang="x-default" href="/en/a">'),
        ("https://s.com/fr/a", ""),
        ("https://s.com/de/a", ""),
        ("https://s.com/solo", "<p>nothing</p>"),
    ])
    got = {r.url: (r.cluster_id, r.n_langs)
           for r in hreflang_clusters(pages).collect()}
    cid = "https://s.com/de/a"  # min url in the component
    assert got == {
        "https://s.com/en/a": (cid, 3),
        "https://s.com/fr/a": (cid, 3),
        "https://s.com/de/a": (cid, 3),
        "https://s.com/solo": ("https://s.com/solo", 0),
    }


def test_mutual_declarations_one_cluster(spark):
    pages = _pages(spark, [
        ("https://s.com/en/b",
         '<link rel="alternate" hreflang="fr" href="/fr/b">'),
        ("https://s.com/fr/b",
         '<link rel="alternate" hreflang="en" href="/en/b">'),
    ])
    got = {r.url: r.cluster_id for r in hreflang_clusters(pages).collect()}
    assert set(got.values()) == {"https://s.com/en/b"}


def _recip(spark, rows):
    df = spark.createDataFrame(rows, "url string, html string")
    return {
        (r.url, r.variant_url): (r.lang, r.status)
        for r in hreflang_reciprocity(df).collect()
    }


def _page(*links):
    return "<html><head>" + "".join(
        f'<link rel="alternate" hreflang="{l}" href="{h}">' for l, h in links
    ) + "</head><body>x</body></html>"


def test_reciprocity_classes(spark):
    a, b, c = "https://s.com/en", "https://s.com/fr", "https://s.com/de"
    ext = "https://other.com/ja"
    rows = [
        # a<->b reciprocal (b declares back), a->c one-way (c silent),
        # a->ext one-way (ext never crawled), plus a self row (dropped)
        (a, _page(("en", a), ("fr", b), ("de", c), ("ja", ext))),
        (b, _page(("en", a))),
        (c, _page()),
    ]
    got = _recip(spark, rows)
    assert got == {
        (a, c): ("de", "missing_return"),
        (a, ext): ("ja", "uncrawled_target"),
    }


def test_reciprocity_any_lang_counts(spark):
    # return tag with a DIFFERENT lang label still reciprocates
    a, b = "https://s.com/a", "https://s.com/b"
    rows = [(a, _page(("en-us", b))), (b, _page(("x-default", a)))]
    assert _recip(spark, rows) == {}


def test_relative_href_resolution(spark):
    a, b = "https://s.com/dir/a", "https://s.com/dir/b"
    rows = [(a, _page(("fr", "b"))), (b, _page())]
    assert _recip(spark, rows) == {(a, b): ("fr", "missing_return")}
