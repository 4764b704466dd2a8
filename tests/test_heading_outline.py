"""heading_outline (plans/structured.py): document order, inline-markup
strip, whitespace collapse, empty headings, attribute'd tags."""

from web_crawler_spark.plans.structured import heading_outline


def _rows(spark, html):
    pages = spark.createDataFrame([("u", html)], "url string, html string")
    return [
        (r["pos"], r["level"], r["heading"])
        for r in heading_outline(pages).orderBy("pos").collect()
    ]


def test_document_order_and_strip(spark):
    html = ("<h1 class=t>Main <em>Title</em></h1><p>x</p>"
            "<h2>A  \n  B</h2><h3 id=z>deep</h3><h2>back up</h2>")
    assert _rows(spark, html) == [
        (0, 1, "Main Title"),
        (1, 2, "A B"),
        (2, 3, "deep"),
        (3, 2, "back up"),
    ]


def test_empty_heading_kept_and_case_insensitive(spark):
    html = "<H2></H2><h6>tail</h6>"
    assert _rows(spark, html) == [(0, 2, ""), (1, 6, "tail")]


def test_no_headings(spark):
    assert _rows(spark, "<p>plain paragraph</p>") == []
