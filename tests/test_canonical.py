"""rel=canonical extraction, Column-level URL reference resolution, and
canonical-target dedup election."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_crawler_spark.functions import urltools as U
from web_crawler_spark.operators.dedup import canonical_url_dedup


def _resolve(spark, base: str, hrefs: list[str | None]) -> list:
    df = spark.createDataFrame([(base, h) for h in hrefs], "base string, href string")
    return [r[0] for r in
            df.select(U.resolve_url(F.col("base"), F.col("href"))).collect()]


class TestResolveUrl:
    def test_forms(self, spark):
        base = "https://a.example.com/dir/sub/page.html"
        got = _resolve(spark, base, [
            "https://other.com/x",            # absolute
            "//cdn.example.com/y",            # protocol-relative
            "/rooted",                        # root-relative
            "sibling.html",                   # document-relative
            "./same.html",                    # dot segment
            "../up.html",                     # parent
            "../../top.html",                 # two parents
            "x#frag",                         # fragment stripped
            "",                               # empty -> NULL
            None,
        ])
        assert got == [
            "https://other.com/x",
            "https://cdn.example.com/y",
            "https://a.example.com/rooted",
            "https://a.example.com/dir/sub/sibling.html",
            "https://a.example.com/dir/sub/same.html",
            "https://a.example.com/dir/up.html",
            "https://a.example.com/top.html",
            "https://a.example.com/dir/sub/x",
            None,
            None,
        ]

    def test_base_without_path(self, spark):
        got = _resolve(spark, "https://a.com", ["x.html", "/y"])
        assert got == ["https://a.com/x.html", "https://a.com/y"]


class TestRelCanonical:
    def test_extraction_forms(self, spark):
        rows = [
            ('<link rel="canonical" href="https://a.com/c1">', "https://a.com/c1"),
            ("<LINK REL=canonical HREF=/c2>", "/c2"),
            ('<link href="https://a.com/c3" rel="canonical">', "https://a.com/c3"),
            ('<link rel="stylesheet" href="/style.css">', None),
            ("<p>no link</p>", None),
        ]
        df = spark.createDataFrame([(h,) for h, _ in rows], "html string")
        got = [r[0] for r in df.select(U.rel_canonical(F.col("html"))).collect()]
        assert got == [e for _, e in rows]


class TestCanonicalDedup:
    def test_self_canonical_wins(self, spark):
        pages = spark.createDataFrame([
            ("https://a.com/p", '<link rel="canonical" href="/p">x'),
            ("https://a.com/p?utm=1", '<link rel="canonical" href="/p">x'),
            ("https://a.com/p?utm=2", '<link rel="canonical" href="/p">x'),
            ("https://a.com/solo", "<p>no canonical</p>"),
        ], "url string, html string")
        kept = canonical_url_dedup(pages).collect()
        by_target = {r["canonical_target"]: r["url"] for r in kept}
        assert by_target == {
            "https://a.com/p": "https://a.com/p",       # self-canonical won
            "https://a.com/solo": "https://a.com/solo",
        }

    def test_min_url_when_no_self(self, spark):
        pages = spark.createDataFrame([
            ("https://a.com/b", '<link rel="canonical" href="/gone">x'),
            ("https://a.com/a", '<link rel="canonical" href="/gone">x'),
        ], "url string, html string")
        kept = canonical_url_dedup(pages).collect()
        assert len(kept) == 1 and kept[0]["url"] == "https://a.com/a"


class TestResolveUrlProperty:
    def test_matches_urljoin_on_supported_subset(self, spark):
        """Pin resolve_url to the stdlib urljoin on the forms it supports
        (absolute, protocol-relative, root-relative, document-relative
        with ./ and bounded ../ towers). Exclusions are the documented
        contract: empty href (urljoin returns base, we return NULL) and
        ../ towers deeper than max_updirs."""
        import itertools
        from urllib.parse import urljoin

        bases = [
            "https://a.example.com/",
            "https://a.example.com/x.html",
            "https://a.example.com/d1/",
            "https://a.example.com/d1/d2/page.html",
            "http://b.org/d1/d2/d3/deep.html",
        ]
        hrefs = [
            "https://z.com/abs", "//cdn.z.com/pr", "/rooted", "/r/2.html",
            "doc.html", "./doc.html", "sub/doc.html", "../doc.html",
            "../../doc.html", "../sub/./doc.html", "a#frag", "../x#f",
        ]
        cases = [(b, h) for b, h in itertools.product(bases, hrefs)]
        from pyspark.sql import functions as F
        df = spark.createDataFrame(cases, "base string, href string")
        got = [r[0] for r in
               df.select(U.resolve_url(F.col("base"), F.col("href"))).collect()]
        for (b, h), g in zip(cases, got):
            want = urljoin(b, h.split("#")[0])
            assert g == want, (b, h, g, want)


def test_idn_host_stage_split_paths(spark):
    from pyspark.sql import functions as F

    from web_crawler_spark.functions.urltools import idn_host_stage

    df = spark.createDataFrame(
        [(1, "Bücher.de"), (2, "EXAMPLE.com"), (3, "пример.рф"),
         (4, "trailing.dot."), (5, "café.fr")],
        "id long, host string",
    )
    got = {r["id"]: r["ascii_host"] for r in idn_host_stage(df).collect()}
    assert got[1] == "xn--bcher-kva.de"
    assert got[2] == "example.com"          # ASCII path: lowercase only
    assert got[3] == "xn--e1afmkfd.xn--p1ai"
    assert got[4] == "trailing.dot."        # ASCII path untouched beyond case
    assert got[5] == "xn--caf-dma.fr"
    # unencodable non-ASCII host passes through lowercased, never raises
    bad = spark.createDataFrame([(9, "ü" + "x" * 80 + ".com")],
                                "id long, host string")
    out = idn_host_stage(bad).collect()[0]["ascii_host"]
    assert out.startswith("ü") and out.endswith(".com")
