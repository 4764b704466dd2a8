"""Content-type magic-byte sniff + charset cascade (BOM > meta > default)."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_crawler_spark.functions import sniff as S


def _sniff(spark, payloads: list[bytes | None]) -> list:
    df = spark.createDataFrame([(p,) for p in payloads], "body binary")
    return [r["mime"] for r in
            df.select(S.content_type_sniff(F.col("body")).alias("mime")).collect()]


class TestMime:
    def test_magic_numbers(self, spark):
        got = _sniff(spark, [
            bytes.fromhex("89504E47") + b"xxxx",
            bytes.fromhex("47494638") + b"39a...",
            bytes.fromhex("FFD8FF") + b"\xe0jpeg",
            b"%PDF-1.7 ...",
            b"PK\x03\x04zipzip",
            bytes.fromhex("1F8B") + b"\x08gz",
        ])
        assert got == ["image/png", "image/gif", "image/jpeg",
                       "application/pdf", "application/zip", "application/gzip"]

    def test_html_and_xml_probes(self, spark):
        got = _sniff(spark, [
            b"<!DOCTYPE html><html>...",
            b"  \n<html lang='en'>",
            b"\xef\xbb\xbf<html>",          # BOM before markup
            b"<?xml version='1.0'?><urlset>",
            b"just plain words",
            b"<plausible-custom-tag>",       # unknown tag: not html
        ])
        assert got == ["text/html", "text/html", "text/html", "text/xml",
                       "application/octet-stream", "application/octet-stream"]

    def test_magic_beats_text_probe(self, spark):
        # A PNG whose payload happens to contain '<html' still sniffs PNG.
        got = _sniff(spark, [bytes.fromhex("89504E47") + b"<html>"])
        assert got == ["image/png"]

    def test_null_and_empty(self, spark):
        got = _sniff(spark, [None, b""])
        assert got == [None, None]


class TestCharset:
    def test_bom_detection(self, spark):
        rows = [
            (b"\xef\xbb\xbfhello", "utf-8"),
            (b"\xff\xfeh\x00", "utf-16-le"),
            (b"\xfe\xffh", "utf-16-be"),
            (b"\xff\xfe\x00\x00h", "utf-32-le"),
            (b"\x00\x00\xfe\xffh", "utf-32-be"),
            (b"hello", None),
        ]
        df = spark.createDataFrame([(b,) for b, _ in rows], "body binary")
        got = [r[0] for r in df.select(S.bom_charset(F.col("body"))).collect()]
        assert got == [e for _, e in rows]

    def test_meta_charset_forms(self, spark):
        rows = [
            ('<meta charset="UTF-8">', "utf-8"),
            ("<meta charset=iso-8859-1>", "iso-8859-1"),
            ("<META CHARSET='Shift_JIS'>", "shift_jis"),
            ('<meta http-equiv="Content-Type" content="text/html; charset=GBK">',
             "gbk"),
            ("<p>no meta at all</p>", None),
        ]
        df = spark.createDataFrame([(h,) for h, _ in rows], "html string")
        got = [r[0] for r in df.select(S.meta_charset(F.col("html"))).collect()]
        assert got == [e for _, e in rows]

    def test_cascade_precedence(self, spark):
        # BOM wins over a conflicting meta; meta wins over the default.
        html = '<html><head><meta charset="iso-8859-1"></head></html>'
        df = spark.createDataFrame(
            [(b"\xef\xbb\xbf" + html.encode(), html),
             (html.encode(), html),
             (b"<p>x</p>", "<p>x</p>")],
            "body binary, html string",
        )
        got = [r[0] for r in
               df.select(S.detect_charset(F.col("body"), F.col("html"))).collect()]
        assert got == ["utf-8", "iso-8859-1", "utf-8"]


class TestDecodeStage:
    def test_charset_cascade_decode(self, spark):
        from web_crawler_spark.functions.sniff import decode_stage

        sjis = "<html><head><meta charset=shift_jis></head><body>日本語</body></html>"
        rows = [
            (1, "﻿utf8 bom café".encode("utf-8")),          # BOM wins
            (2, "utf16 text".encode("utf-16")),                   # BOM-carrying utf-16
            (3, sjis.encode("shift_jis")),                        # meta-declared
            (4, '<meta charset="no-such-charset">x'.encode()),    # bogus -> default
            (5, b"\xff\xfa plain broken \xfe bytes"),             # replace, no crash
            (6, None),
        ]
        df = spark.createDataFrame(rows, "id long, html binary")
        got = {r["id"]: r for r in decode_stage(df).collect()}
        assert got[1]["charset"] == "utf-8" and got[1]["html_text"] == "utf8 bom café"
        assert got[2]["charset"].startswith("utf-16") and got[2]["html_text"] == "utf16 text"
        assert got[3]["charset"] == "shift_jis" and "日本語" in got[3]["html_text"]
        assert got[4]["charset"] == "no-such-charset"   # sniffed as declared...
        assert got[4]["html_text"].endswith("x")         # ...decoded via fallback
        assert "�" in got[5]["html_text"]           # replacement chars
        assert got[6]["html_text"] is None
