"""dust_rewrite (urlfilter.py): param stripping mechanics + the mined
end-to-end collapse via the registry."""

import __spark_entry__ as E
from web_crawler_spark.operators import urlfilter as UF


def test_strip_mechanics(spark):
    rows = [
        ("https://a.com/p?keep=1&sid=9&utm=x",),
        ("https://a.com/p?sid=9",),              # query drops entirely
        ("https://a.com/p",),                     # no query untouched
        ("https://a.com/p?sidecar=1",),           # prefix must not overmatch
    ]
    df = spark.createDataFrame(rows, "url string")
    out = [r["canonical_url"] for r in
           UF.dust_rewrite(df, ["sid", "utm"]).collect()]
    assert out == [
        "https://a.com/p?keep=1",
        "https://a.com/p",
        "https://a.com/p",
        "https://a.com/p?sidecar=1",
    ]


def test_fragment_preserved(spark):
    # Fragments must survive the rewrite: split off BEFORE the '?' parse,
    # re-appended after — never glued into the last param, never dropped
    # when every param is stripped.
    rows = [
        ("https://a.com/p?sid=9#sec2",),           # all params stripped
        ("https://a.com/p?keep=1&sid=9#frag",),    # params survive
        ("https://a.com/p#only",),                  # fragment, no query
    ]
    df = spark.createDataFrame(rows, "url string")
    out = [r["canonical_url"] for r in
           UF.dust_rewrite(df, ["sid", "utm"]).collect()]
    assert out == [
        "https://a.com/p#sec2",
        "https://a.com/p?keep=1#frag",
        "https://a.com/p#only",
    ]


def test_end_to_end_collapse(spark):
    row = E.queries()["url_dust_rewrite"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert row["params_stripped"] == "sid,utm"
    assert row["n_canonical"] < row["n_urls"]
    assert row["saved_milli"] == 1000 * (
        row["n_urls"] - row["n_canonical"]
    ) // row["n_urls"]
