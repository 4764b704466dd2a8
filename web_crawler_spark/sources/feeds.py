"""RSS 2.0 / Atom 1.0 feed ingestion on the stdlib (public specs).

Feeds are the second URL-discovery channel next to sitemaps (news crawls
poll them; Common Crawl's news corpus is feed-driven). This module parses
both document shapes — RSS ``<rss><channel><item>`` and Atom
``<feed><entry>`` — plus gzipped transport, with the same bounded-
decompression and per-file error-isolation discipline as
``sources/sitemap.py``.

``feed_scan`` distributes the parse: feed files load as ``binaryFile``
rows, each parses inside an Arrow-batched ``mapInPandas`` stage →
(feed_path, feed_kind, item_url, title, pub_ts string). Timestamps stay
raw strings (RFC 822 for RSS, RFC 3339 for Atom) — coercion is the
caller's column-level choice, so a malformed date never poisons the scan.
"""

from __future__ import annotations

import gzip
import io
from xml.etree import ElementTree as ET

_ATOM_NS = "http://www.w3.org/2005/Atom"

MAX_FEED_BYTES = 64 * 1024 * 1024


def parse_feed(data: bytes, max_bytes: int = MAX_FEED_BYTES) -> list[dict]:
    """Bytes (optionally gzipped) → item dicts in document order:
    {feed_kind: 'rss'|'atom', item_url, title, pub_ts}. Unknown fields are
    None. Raises on malformed input (per-file isolation lives in the scan
    stage); gzip is bounded like the sitemap reader."""
    if data[:2] == b"\x1f\x8b":
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as gf:
            data = gf.read(max_bytes + 1)
        if len(data) > max_bytes:
            raise ValueError(f"feed exceeds {max_bytes} decompressed bytes")
    root = ET.fromstring(data)
    local = root.tag.rsplit("}", 1)[-1].lower()
    out: list[dict] = []
    if local == "rss":
        channel = root.find("channel")
        if channel is None:
            raise ValueError("rss document without <channel>")
        for item in channel.findall("item"):
            link = item.findtext("link")
            out.append({
                "feed_kind": "rss",
                "item_url": link.strip() if link else None,
                "title": (item.findtext("title") or "").strip() or None,
                "pub_ts": (item.findtext("pubDate") or "").strip() or None,
            })
        return out
    if local == "feed":
        def q(name: str) -> list[str]:
            return [f"{{{_ATOM_NS}}}{name}", name]

        def findtext(el, name):
            for t in q(name):
                v = el.findtext(t)
                if v is not None:
                    return v.strip() or None
            return None

        entries = []
        for t in q("entry"):
            entries = root.findall(t)
            if entries:
                break
        for entry in entries:
            href = None
            for t in q("link"):
                for ln in entry.findall(t):
                    # rel defaults to 'alternate' per RFC 4287 §4.2.7.2
                    if ln.get("rel") in (None, "alternate"):
                        href = ln.get("href")
                        break
                if href:
                    break
            out.append({
                "feed_kind": "atom",
                "item_url": href.strip() if href else None,
                "title": findtext(entry, "title"),
                "pub_ts": findtext(entry, "updated") or findtext(entry, "published"),
            })
        return out
    raise ValueError(f"not a feed document: <{local}>")


def rss_bytes(items: list[tuple[str, str, str]]) -> bytes:
    """Serialize (url, title, pubDate) triples as honest RSS 2.0 bytes."""
    from xml.sax.saxutils import escape

    rows = "".join(
        f"<item><title>{escape(t)}</title><link>{escape(u)}</link>"
        f"<pubDate>{escape(p)}</pubDate></item>"
        for u, t, p in items
    )
    return (f'<?xml version="1.0" encoding="UTF-8"?><rss version="2.0">'
            f"<channel><title>feed</title>{rows}</channel></rss>").encode()


def atom_bytes(items: list[tuple[str, str, str]]) -> bytes:
    """Serialize (url, title, updated) triples as honest Atom 1.0 bytes."""
    from xml.sax.saxutils import escape

    rows = "".join(
        f"<entry><title>{escape(t)}</title>"
        f'<link rel="alternate" href="{escape(u, {chr(34): "&quot;"})}"/>'
        f"<updated>{escape(p)}</updated></entry>"
        for u, t, p in items
    )
    return (f'<?xml version="1.0" encoding="UTF-8"?>'
            f'<feed xmlns="{_ATOM_NS}"><title>feed</title>{rows}</feed>').encode()


def feed_rows_stage(df):
    """(path, content binary) → (feed_path, feed_kind, item_url, title,
    pub_ts) — one feed per task-row, Arrow-batched, with per-file error
    isolation (a malformed feed yields one feed_kind='error' row carrying
    the exception text in item_url, never a failed stage)."""
    import pandas as pd

    from pyspark.sql import types as ST

    schema = ST.StructType(
        [
            ST.StructField("feed_path", ST.StringType()),
            ST.StructField("feed_kind", ST.StringType()),
            ST.StructField("item_url", ST.StringType()),
            ST.StructField("title", ST.StringType()),
            ST.StructField("pub_ts", ST.StringType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            out = {k: [] for k in
                   ("feed_path", "feed_kind", "item_url", "title", "pub_ts")}
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    items = parse_feed(bytes(content))
                except Exception as exc:  # noqa: BLE001 — isolate any bad file
                    items = [{"feed_kind": "error",
                              "item_url": f"{type(exc).__name__}: {exc}",
                              "title": None, "pub_ts": None}]
                for it in items:
                    out["feed_path"].append(path)
                    for k in ("feed_kind", "item_url", "title", "pub_ts"):
                        out[k].append(it[k])
            yield pd.DataFrame(out)

    return df.select("path", "content").mapInPandas(gen, schema)


def feed_scan(spark, path: str):
    return feed_rows_stage(
        spark.read.format("binaryFile").load(path).select("path", "content")
    )
