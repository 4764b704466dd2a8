"""microdata_records (plans/structured.py): content-vs-text precedence,
attribute order, nested-markup text cut, itemtype rows, no-microdata
pages."""

from web_crawler_spark.plans.structured import microdata_records


def _pages(spark, html):
    return spark.createDataFrame([("u1", html)], "url string, html string")


def _rows(spark, html):
    return sorted(
        tuple(r) for r in microdata_records(_pages(spark, html)).collect()
    )


def test_full_item(spark):
    html = (
        '<div itemscope itemtype="https://schema.org/Product">'
        '<span itemprop="name">Widget</span>'
        '<meta itemprop="price" content="9.99">'
        "</div>"
    )
    assert _rows(spark, html) == sorted([
        ("u1", "itemtype", "https://schema.org/Product", None),
        ("u1", "itemprop", "name", "Widget"),
        ("u1", "itemprop", "price", "9.99"),
    ])


def test_attribute_order_and_text_cut(spark):
    html = (
        '<meta content="USD" itemprop="currency">'
        '<span itemprop="brand">Acme <b>inc</b></span>'
    )
    rows = _rows(spark, html)
    assert ("u1", "itemprop", "currency", "USD") in rows
    # immediate text node only, trimmed at the first '<'
    assert ("u1", "itemprop", "brand", "Acme") in rows


def test_content_attribute_wins_over_text(spark):
    html = '<span itemprop="sku" content="ABC">visible</span>'
    assert _rows(spark, html) == [("u1", "itemprop", "sku", "ABC")]


def test_empty_text_and_no_microdata(spark):
    html = '<span itemprop="note"></span><p>plain</p>'
    assert _rows(spark, html) == [("u1", "itemprop", "note", "")]
    assert _rows(spark, "<p>nothing here</p>") == []
