"""Sitemap ingestion (sitemaps.org protocol — public spec) on the stdlib.

The reference crawler seeds from a YAML list (settings.yaml:41-60); real
crawls seed from robots.txt-advertised sitemaps. This module parses the
two document shapes of the protocol — ``<urlset>`` (leaf: url/loc +
optional lastmod/changefreq/priority) and ``<sitemapindex>`` (pointers to
child sitemaps) — plus the ubiquitous ``.xml.gz`` transport, with
zipfile-free stdlib only (gzip + ElementTree).

``sitemap_scan`` distributes the parse: sitemap files load as ``binaryFile``
rows, each parses inside an Arrow-batched ``mapInPandas`` stage →
(sitemap_path, kind, loc, lastmod, changefreq, priority). Index entries
come back with kind='sitemap' so the caller can iterate fetch rounds
(index → children → URLs) exactly like the frontier's ring expansion; leaf
entries (kind='url') feed ``seeds``/frontier construction directly.
"""

from __future__ import annotations

import gzip
import io
from xml.etree import ElementTree as ET

_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"

# Decompressed-size ceiling for .xml.gz sitemaps. The protocol caps an
# uncompressed sitemap at 50 MB; a hostile archive (gzip bomb) from a real
# crawl must not be able to OOM an executor, so the bound is enforced here
# rather than trusted.
MAX_SITEMAP_BYTES = 64 * 1024 * 1024


def parse_sitemap(data: bytes, max_bytes: int = MAX_SITEMAP_BYTES) -> list[dict]:
    """Bytes (optionally gzipped) → entry dicts. Unknown/missing fields are
    None; entries keep document order. Tolerates the no-namespace variant
    some generators emit. Gzip input is decompressed through a bounded
    reader: payloads expanding past ``max_bytes`` raise ValueError instead
    of ballooning executor memory."""
    if data[:2] == b"\x1f\x8b":
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as gf:
            data = gf.read(max_bytes + 1)
        if len(data) > max_bytes:
            raise ValueError(f"sitemap exceeds {max_bytes} decompressed bytes")
    root = ET.fromstring(data)

    def tag(name: str) -> list[str]:
        return [f"{{{_NS}}}{name}", name]

    def findtext(el, name: str):
        for t in tag(name):
            v = el.findtext(t)
            if v is not None:
                return v.strip()
        return None

    local = root.tag.rsplit("}", 1)[-1]
    kind = "sitemap" if local == "sitemapindex" else "url"
    child_names = tag("sitemap" if kind == "sitemap" else "url")
    out = []
    for child in root:
        if child.tag not in child_names:
            continue
        loc = findtext(child, "loc")
        if not loc:
            continue
        out.append(
            {
                "kind": kind,
                "loc": loc,
                "lastmod": findtext(child, "lastmod"),
                "changefreq": findtext(child, "changefreq"),
                "priority": findtext(child, "priority"),
            }
        )
    return out


def sitemap_bytes(
    entries: list[tuple], index: bool = False, gz: bool = False
) -> bytes:
    """Serialize entries [(loc, lastmod-or-None), ...] → sitemap XML bytes
    (``<sitemapindex>`` when index=True); optionally gzipped. The writer
    exists for fixtures and for re-exporting a crawled frontier."""
    from xml.sax.saxutils import escape

    root = "sitemapindex" if index else "urlset"
    child = "sitemap" if index else "url"
    parts = [f'<?xml version="1.0" encoding="UTF-8"?><{root} xmlns="{_NS}">']
    for loc, lastmod in entries:
        lm = f"<lastmod>{escape(lastmod)}</lastmod>" if lastmod else ""
        parts.append(f"<{child}><loc>{escape(loc)}</loc>{lm}</{child}>")
    parts.append(f"</{root}>")
    data = "".join(parts).encode()
    return gzip.compress(data, mtime=0) if gz else data


def sitemap_rows_stage(df):
    """(path, content binary) → (sitemap_path, kind, loc, lastmod,
    changefreq, priority) — one sitemap per task-row, Arrow-batched.

    Per-file error isolation (the F5 discipline the fetch path follows,
    engine.py:83-90 in the reference): one malformed/truncated/oversized
    sitemap yields a single kind='error' row carrying the exception text in
    ``loc`` instead of failing the whole Spark stage."""
    import pandas as pd

    from pyspark.sql import types as ST

    schema = ST.StructType(
        [
            ST.StructField("sitemap_path", ST.StringType()),
            ST.StructField("kind", ST.StringType()),
            ST.StructField("loc", ST.StringType()),
            ST.StructField("lastmod", ST.StringType()),
            ST.StructField("changefreq", ST.StringType()),
            ST.StructField("priority", ST.StringType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            out = {k: [] for k in
                   ("sitemap_path", "kind", "loc", "lastmod", "changefreq", "priority")}
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    entries = parse_sitemap(bytes(content))
                except Exception as exc:  # noqa: BLE001 — isolate any bad file
                    entries = [{
                        "kind": "error",
                        "loc": f"{type(exc).__name__}: {exc}",
                        "lastmod": None, "changefreq": None, "priority": None,
                    }]
                for e in entries:
                    out["sitemap_path"].append(path)
                    for k in ("kind", "loc", "lastmod", "changefreq", "priority"):
                        out[k].append(e[k])
            yield pd.DataFrame(out)

    return df.select("path", "content").mapInPandas(gen, schema)


def sitemap_scan(spark, path: str):
    return sitemap_rows_stage(
        spark.read.format("binaryFile").load(path).select("path", "content")
    )
