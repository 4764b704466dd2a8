"""Structured-data extraction (JSON-LD / OpenGraph) — block isolation,
attribute-order independence, malformed-payload isolation, multi-line."""

from web_crawler_spark.plans.structured import (
    jsonld_blocks,
    jsonld_records,
    opengraph_tags,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_jsonld_blocks_in_document_order(spark):
    html = (
        '<head><script type="application/ld+json">{"a":1}</script>'
        '<script src="x.js"></script>'
        '<script type="application/ld+json" async>{"b":2}</script></head>'
    )
    rows = jsonld_blocks(_pages(spark, [("u", html)])).orderBy("block_idx").collect()
    assert [(r["block_idx"], r["json"]) for r in rows] == [
        (0, '{"a":1}'),
        (1, '{"b":2}'),
    ]


def test_jsonld_records_fields_and_malformed_isolation(spark):
    ok = (
        '<script type="application/ld+json">\n'
        '{"@context":"https://schema.org",\n "@type":"Article",\n'
        ' "headline":"He said \\"hi\\"","wordCount":42}\n</script>'
    )
    bad = '<script type="application/ld+json">{not json</script>'
    notype = '<script type="application/ld+json">{"headline":"x"}</script>'
    rows = (
        jsonld_records(
            _pages(spark, [("u1", ok), ("u2", bad), ("u3", notype)]),
            fields={"headline": "$.headline", "wc": "$.wordCount"},
        )
        .orderBy("url")
        .collect()
    )
    assert rows[0]["rtype"] == "Article"
    assert rows[0]["headline"] == 'He said "hi"'
    assert rows[0]["wc"] == "42"
    assert rows[1]["rtype"] is None and rows[1]["headline"] is None
    assert rows[2]["rtype"] is None and rows[2]["headline"] == "x"


def test_opengraph_both_attribute_orders(spark):
    html = (
        '<head><meta charset="utf-8">'
        '<meta property="og:title" content="A">'
        '<meta content="B" property="og:description">'
        '<meta name="viewport" content="w">'
        '<meta property="og:locale">'
        '<meta property="og:empty" content="">'
        "</head>"
    )
    rows = opengraph_tags(_pages(spark, [("u", html)])).orderBy("prop").collect()
    got = [(r["prop"], r["content"]) for r in rows]
    assert got == [
        ("og:description", "B"),
        ("og:empty", ""),
        ("og:title", "A"),
    ]


def test_opengraph_multiline_tag(spark):
    html = '<meta\n  property="og:image"\n  content="https://x/y.png"\n>'
    rows = opengraph_tags(_pages(spark, [("u", html)])).collect()
    assert [(r["prop"], r["content"]) for r in rows] == [
        ("og:image", "https://x/y.png")
    ]


def test_zero_shuffle_plans(spark):
    df = _pages(spark, [("u", "<head></head>")])
    for frame in (
        jsonld_records(df, fields={"h": "$.h"}),
        opengraph_tags(df),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
