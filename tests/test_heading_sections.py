"""heading_sections (plans/structured.py): preamble semantics, body
pairing, agreement with heading_outline on what a heading is."""

from web_crawler_spark.plans.structured import heading_outline, heading_sections


def _rows(spark, html):
    pages = spark.createDataFrame([("u", html)], "url string, html string")
    return [
        (r["section_idx"], r["title"], r["body"])
        for r in heading_sections(pages).orderBy("section_idx").collect()
    ]


def test_preamble_and_body_pairing(spark):
    html = ("<p>intro words</p><h1>One</h1><p>a</p><p>b</p>"
            "<h2>Two <em>x</em></h2><ul><li>c</li></ul>")
    assert _rows(spark, html) == [
        (0, None, "intro words"),
        (1, "One", "a b"),
        (2, "Two x", "c"),
    ]


def test_no_preamble_row_when_empty(spark):
    html = "<h1>T</h1><p>body</p>"
    assert _rows(spark, html) == [(1, "T", "body")]


def test_agrees_with_outline(spark):
    html = "<h1>A</h1>x<h3>B</h3>y<h2>C</h2>z"
    pages = spark.createDataFrame([("u", html)], "url string, html string")
    titles = [r["heading"] for r in
              heading_outline(pages).orderBy("pos").collect()]
    secs = [t for _, t, _ in _rows(spark, html) if t is not None]
    assert titles == secs == ["A", "B", "C"]


def test_headingless_page_preamble_only(spark):
    assert _rows(spark, "<p>just text</p>") == [(0, None, "just text")]
