"""Structured-data extraction from HTML — the Web Data Commons workload
over Common Crawl: schema.org JSON-LD blocks and OpenGraph ``<meta>``
tags, as pure column expressions (regexp + JSON-path), zero shuffles.

Reference parity note: the reference's extraction layer
(pacong/scrapers/generic_scraper.py) pulls fields from rendered DOM via
CSS selectors; structured-data blocks are the corpus-scale complement —
the publisher's own machine-readable declarations — and the dominant
source of typed page metadata in a 100 TB crawl (WDC extracts billions
of such records per CC snapshot).

All patterns are RE2-portable (shared verbatim with the DuckDB oracles)
and attribute-order-independent: tags are isolated first, then each
attribute is extracted from the tag independently, so
``<meta content=.. property=..>`` parses identically to the canonical
order. ``(?s)`` keeps multi-line blocks intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one capture: the raw JSON payload of each ld+json script block
JSONLD_BLOCK_RE = (
    r'(?s)<script[^>]*type="application/ld\+json"[^>]*>(.*?)</script>'
)
# whole-tag isolation; attributes extracted per-tag afterwards
META_TAG_RE = r"(?s)<meta\s[^>]*>"
META_PROP_RE = r'property="([^"]+)"'
META_CONTENT_RE = r'content="([^"]*)"'


def jsonld_blocks(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """One row per ``<script type="application/ld+json">`` block:
    (url, block_idx, json) in document order. Pure regexp projection —
    no shuffle, scales as a map over the page scan."""
    return pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(JSONLD_BLOCK_RE), 1)
        ).alias("block_idx", "json"),
    )


def jsonld_records(
    pages: DataFrame,
    fields: dict[str, str] | None = None,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """Typed schema.org records from JSON-LD blocks: ``@type`` plus the
    requested ``fields`` ({out_col: json_path}) via ``get_json_object``
    (path syntax shared with the oracle's ``json_extract_string``).
    Blocks whose payload is not valid JSON yield NULL fields rather than
    failing the stage (both engines' extractors are null-on-malformed) —
    the F5 error-isolation discipline. Top-level ``@graph`` envelopes are
    NOT unwrapped (documented subset; records inside @graph surface when
    the caller points a field path at it)."""
    fields = fields or {"headline": "$.headline"}
    b = jsonld_blocks(pages, html_col, url_col)
    cols = [
        "url",
        "block_idx",
        F.get_json_object("json", "$['@type']").alias("rtype"),
    ]
    for out, path in fields.items():
        cols.append(F.get_json_object("json", path).alias(out))
    return b.select(*cols)


def opengraph_tags(
    pages: DataFrame,
    prefix: str = "og:",
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """(url, prop, content) for every OpenGraph ``<meta>`` tag, both
    attribute orders, tags without a content attribute dropped. Non-og
    metas (charset, name=) never match the prefix filter."""
    tags = pages.select(
        F.col(url_col).alias("url"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(META_TAG_RE), 0)
        ).alias("tag"),
    )
    return (
        tags.select(
            "url",
            "tag",
            F.regexp_extract("tag", META_PROP_RE, 1).alias("prop"),
            F.regexp_extract("tag", META_CONTENT_RE, 1).alias("content"),
        )
        .filter(F.col("prop").startswith(prefix))
        .filter(F.col("tag").rlike('content="'))
        .drop("tag")
    )


# microdata: whole itemprop-tag isolation (plus its immediate text node),
# attributes pulled per-tag afterwards — RE2-portable, no backreferences
ITEMTYPE_RE = r'itemtype="([^"]+)"'
ITEMPROP_TAG_RE = r'(?s)<[^>]*\sitemprop="[^"]*"[^>]*>[^<]*'
ITEMPROP_NAME_RE = r'itemprop="([^"]+)"'
ITEMPROP_TEXT_RE = r">([^<]*)$"


def microdata_records(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Schema.org HTML microdata — the third leg of the Web Data Commons
    structured-data triple (JSON-LD + OpenGraph + microdata; WDC's CC
    extractions report microdata as the highest-volume format of the
    three). Flat extraction, declared subset: one row per ``itemtype``
    declaration (kind='itemtype', name=the vocabulary URL, value NULL)
    and one per ``itemprop`` (kind='itemprop', value = the ``content``
    attribute when present — the <meta>/<link> convention — else the
    element's IMMEDIATE text node, text up to the first '<'; nested-tag
    item trees are not reassembled, the documented subset since RE2 has
    no backreferences for matching closing tags). Attribute-order
    independent by whole-tag isolation, zero shuffles.
    """
    t = pages.select(
        F.col(url_col).alias("url"),
        F.explode(
            F.regexp_extract_all(
                F.col(html_col), F.lit(ITEMPROP_TAG_RE), 0
            )
        ).alias("m"),
    )
    props = (
        t.select(
            "url",
            F.lit("itemprop").alias("kind"),
            F.regexp_extract("m", ITEMPROP_NAME_RE, 1).alias("name"),
            F.when(
                F.col("m").rlike('content="'),
                F.regexp_extract("m", META_CONTENT_RE, 1),
            )
            .otherwise(F.trim(F.regexp_extract("m", ITEMPROP_TEXT_RE, 1)))
            .alias("value"),
        )
        .filter(F.col("name") != "")
    )
    types = pages.select(
        F.col(url_col).alias("url"),
        F.lit("itemtype").alias("kind"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(ITEMTYPE_RE), 1)
        ).alias("name"),
        F.lit(None).cast("string").alias("value"),
    )
    return types.unionByName(props)


# whole h-element isolation in document order; level + inner text pulled
# per match (closing tag matched as any </h1-6> — RE2 has no
# backreferences; mis-nested heading pairs are a declared subset)
HEADING_RE = r"(?is)<h[1-6][^>]*>.*?</h[1-6]>"
HEADING_LEVEL_RE = r"(?i)<h([1-6])"
TAG_STRIP_RE = r"<[^>]+>"


def heading_outline(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Document-order heading outline — (url, pos, level, heading) for
    every ``<h1>``–``<h6>`` element: the structure signal for
    section-aware passage chunking (RAG corpora chunk at headings
    before falling back to fixed windows — this is the table
    ``passage_windows`` composes with) and for title/outline features in
    quality models. Inline markup inside a heading is stripped, entities
    left as-is, whitespace collapsed; empty headings kept (pos is the
    structural position, presence is the signal). Pure regexp projection,
    zero shuffles, RE2 patterns shared verbatim with the oracle.
    """
    t = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(HEADING_RE), 0)
        ).alias("pos", "m"),
    )
    return t.select(
        "url",
        "pos",
        F.regexp_extract("m", HEADING_LEVEL_RE, 1).cast("int").alias("level"),
        F.trim(
            F.regexp_replace(
                F.regexp_replace("m", TAG_STRIP_RE, " "), r"\s+", " "
            )
        ).alias("heading"),
    )


def heading_sections(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Heading-delimited section chunks — (url, section_idx, title,
    body): the structure-aware chunking unit RAG pipelines prefer over
    fixed windows when the page declares its own outline (section_idx 0
    is the pre-heading preamble, emitted only when non-empty, title
    NULL; sections 1..n pair each heading with the markup that follows
    it up to the next heading). Titles and bodies are tag-stripped and
    whitespace-collapsed; splitting uses the same RE2 heading pattern as
    :func:`heading_outline`, so the two tables always agree on what a
    heading is. Pure regexp projection + one generator, zero shuffles.
    """
    def clean(c):
        # tags become spaces (block boundaries must separate words), then
        # whitespace collapses — '<p>a</p><p>b</p>' reads "a b", not "ab"
        return F.trim(
            F.regexp_replace(
                F.regexp_replace(c, TAG_STRIP_RE, " "), r"\s+", " "
            )
        )

    h = F.regexp_extract_all(F.col(html_col), F.lit(HEADING_RE), 0)
    frags = F.split(F.col(html_col), HEADING_RE)
    base = pages.select(
        F.col(url_col).alias("url"),
        h.alias("__h"),
        frags.alias("__f"),
    )
    sections = base.select(
        "url",
        F.posexplode("__h").alias("i", "m"),
        F.col("__f").alias("__f"),
    ).select(
        "url",
        (F.col("i") + 1).cast("int").alias("section_idx"),
        clean(F.col("m")).alias("title"),
        clean(F.col("__f")[F.col("i") + 1]).alias("body"),
    )
    preamble = base.select(
        "url",
        F.lit(0).cast("int").alias("section_idx"),
        F.lit(None).cast("string").alias("title"),
        clean(F.col("__f")[0]).alias("body"),
    ).filter(F.col("body") != "")
    return preamble.unionByName(sections)
