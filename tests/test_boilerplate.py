"""Boilerplate removal: HTML block segmentation, jusText-style
classification with context smoothing, main-content reassembly."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_crawler_spark.operators import boilerplate as B

_PAGE = """
<html><head><title>t</title><style>.x{color:red}</style>
<script>var nav = "menu";</script></head>
<body>
<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>
<h1>The story of a crawler</h1>
<p>The crawler is a program that walks the web and it is written for the
purpose of fetching pages. It is the backbone of a search engine and of
the training corpora that feed language models.</p>
<p>It is polite to hosts and it is careful with the robots file, and that
discipline is the reason operators tolerate it at all.</p>
<div><a href="/p1">Related one</a> <a href="/p2">Related two</a></div>
<p>Short tail.</p>
<footer><a href="/tos">Terms</a> <a href="/privacy">Privacy</a></footer>
</body></html>
"""


class TestSegmentation:
    def test_blocks_and_link_density(self):
        blocks = B._segment_html(_PAGE)
        texts = [t for t, _ in blocks]
        assert any(t.startswith("The crawler is a program") for t in texts)
        # nav block is pure links -> link density 1.0
        nav = next((ld for t, ld in blocks if "Home" in t), None)
        assert nav == 1.0
        prose = next(ld for t, ld in blocks if t.startswith("The crawler"))
        assert prose == 0.0
        # script/style text never leaks into blocks
        assert not any("color:red" in t or "var nav" in t for t in texts)

    def test_malformed_html_no_raise(self):
        for bad in ["<p>unclosed <div><a href=", "<<<>>>", "", None,
                    "<p>&bogus; &amp; ok</p>"]:
            B._segment_html(bad)  # must not raise

    def test_distributed_stage(self, spark):
        pages = spark.createDataFrame(
            [("u1", _PAGE), ("u2", "<p>plain</p>"), ("u3", None)],
            "url string, html string",
        )
        out = B.html_blocks(pages).toPandas()
        assert set(out[out["url"] == "u1"]["block_idx"]) == set(
            range((out["url"] == "u1").sum())
        )
        assert (out[out["url"] == "u2"]["text"] == "plain").all()
        assert (out["url"] == "u3").sum() == 0  # null html -> no blocks


class TestClassification:
    def _blocks(self, spark, rows):
        return spark.createDataFrame(
            rows, "url string, block_idx int, text string, link_density double"
        )

    def test_raw_classes(self, spark):
        good = ("the crawler is a program that walks the web and it is "
                "written for the purpose of fetching pages end to end")
        df = self._blocks(spark, [
            ("u", 0, "Home About Contact", 1.0),          # bad: link-dense
            ("u", 1, good, 0.0),                            # good
        ])
        got = {r["block_idx"]: r["block_class"]
               for r in B.classify_blocks(df).collect()}
        assert got == {0: "bad", 1: "good"}

    def test_smoothing_adopts_good_neighbor(self, spark):
        good = ("the crawler is a program that walks the web and it is "
                "written for the purpose of fetching pages end to end")
        df = self._blocks(spark, [
            ("u", 0, good, 0.0),
            ("u", 1, "short tail", 0.0),     # undecided -> neighbor is good
            ("u", 2, "Home About", 1.0),     # decided bad stays bad
        ])
        got = {r["block_idx"]: r["block_class"]
               for r in B.classify_blocks(df).collect()}
        assert got == {0: "good", 1: "good", 2: "bad"}

    def test_isolated_undecided_is_bad(self, spark):
        df = self._blocks(spark, [
            ("u", 0, "Nav Bar", 1.0),
            ("u", 1, "short tail", 0.0),
            ("u", 2, "More Links", 1.0),
        ])
        got = {r["block_idx"]: r["block_class"]
               for r in B.classify_blocks(df).collect()}
        assert got == {0: "bad", 1: "bad", 2: "bad"}


class TestMainContent:
    def test_end_to_end(self, spark):
        pages = spark.createDataFrame([("u1", _PAGE)], "url string, html string")
        out = B.extract_main_content(pages).collect()[0]
        assert out["n_blocks"] > out["n_good_blocks"] > 0
        assert out["main_text"].startswith("The story of a crawler")
        assert "Home" not in out["main_text"]          # nav dropped
        assert "Terms" not in out["main_text"]         # footer dropped
        assert "robots file" in out["main_text"]       # prose kept
        # 'Short tail.' is undecided but sits after a link-dense div and
        # before the footer... its nearest decided neighbors: the div (bad)
        # and footer (bad) -> dropped.
        assert "Short tail." not in out["main_text"]

    def test_all_boilerplate_doc_survives_empty(self, spark):
        pages = spark.createDataFrame(
            [("u", "<nav><a href='/'>Home</a><a href='/x'>X</a></nav>")],
            "url string, html string",
        )
        out = B.extract_main_content(pages).collect()[0]
        assert out["main_text"] == "" and out["n_good_blocks"] == 0
