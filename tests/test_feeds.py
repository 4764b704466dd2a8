"""RSS 2.0 / Atom 1.0 feed ingestion."""
import gzip

from web_crawler_spark.sources.feeds import (
    atom_bytes,
    feed_scan,
    parse_feed,
    rss_bytes,
)


def test_parse_rss_and_atom_roundtrip():
    items = [("https://a.com/1", "One & two", "Mon, 06 Jan 2025 08:00:00 GMT"),
             ("https://a.com/2", "<Tags>", "Tue, 07 Jan 2025 08:00:00 GMT")]
    got = parse_feed(rss_bytes(items))
    assert [(g["item_url"], g["title"], g["pub_ts"]) for g in got] == items
    a = parse_feed(atom_bytes([("https://b.com/x?q=\"1\"", "T", "2025-01-06T00:00:00Z")]))
    assert a[0]["item_url"] == 'https://b.com/x?q="1"'
    assert a[0]["feed_kind"] == "atom" and a[0]["pub_ts"] == "2025-01-06T00:00:00Z"


def test_atom_link_rel_selection():
    # only rel=alternate (or unset) links are the item URL per RFC 4287
    feed = (
        '<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">'
        '<entry><title>t</title>'
        '<link rel="self" href="https://b.com/feed.xml"/>'
        '<link rel="alternate" href="https://b.com/post"/>'
        '<updated>2025-01-01T00:00:00Z</updated></entry></feed>'
    ).encode()
    assert parse_feed(feed)[0]["item_url"] == "https://b.com/post"


def test_gzip_bound_and_malformed():
    import pytest

    blob = gzip.compress(rss_bytes([("u", "t", "p")]))
    assert parse_feed(blob)[0]["item_url"] == "u"
    with pytest.raises(ValueError):
        parse_feed(gzip.compress(b"\x00" * 100), max_bytes=10)
    with pytest.raises(ValueError):
        parse_feed(b"<opml></opml>")


def test_distributed_scan_isolates_bad_file(spark, tmp_path):
    (tmp_path / "ok.xml").write_bytes(rss_bytes([("https://a/1", "t", "p")]))
    (tmp_path / "bad.xml").write_bytes(b"truncated <rss")
    rows = feed_scan(spark, str(tmp_path)).collect()
    kinds = sorted(r["feed_kind"] for r in rows)
    assert kinds == ["error", "rss"]
    ok = [r for r in rows if r["feed_kind"] == "rss"][0]
    assert ok["item_url"] == "https://a/1"
