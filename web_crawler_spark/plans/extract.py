"""HTML → rows extraction (SURVEY §2.8 X7/X9/X11 + the outlink 'expand'
stage the north_rule adds).

The reference parses with BeautifulSoup(html.parser) + ``get_text(strip=
True)`` (pacong/scrapers/business_insider.py:97-158, simple_generic.py:
114-142). This container has no bs4, so the engine pins an equivalent
contract on stdlib ``html.parser``:

* tables are walked in document order; a ``<tr>`` inside nested tables
  belongs to every open ancestor table (BS ``find_all('tr')`` descends);
* cell text = every descendant text chunk, each ``.strip()``-ed, joined
  with '' — exactly ``get_text(strip=True)``;
* fixtures are well-formed (explicitly closed tags), which is the subset
  where html.parser and BS agree byte-for-byte.

Everything runs inside ``mapInPandas`` — Arrow batches in, Arrow batches
out, 1→N rows per page. Python is unavoidable here (real HTML parsing);
batching keeps it off the per-row slow path. At 100 TB this stage is
embarrassingly parallel: no shuffle, scans ``html`` only (column-pruned).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Pure-Python core (unit-testable without Spark)
# ---------------------------------------------------------------------------


class _TableParser(HTMLParser):
    """Collect (cells per row per table) + links + visible text in one pass."""

    _SKIP_TEXT_IN = {"script", "style"}

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.tables: list[list[list[str]]] = []   # table -> rows -> cells
        self._open_tables: list[list[list[str]]] = []
        self._open_rows: list[list[str]] = []      # row shared by open tables
        self._open_cells: list[list[str]] = []     # text chunks per open cell
        self.links: list[str] = []
        self._text_chunks: list[str] = []
        self._suppress = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in self._SKIP_TEXT_IN:
            self._suppress += 1
            return
        if tag == "table":
            t: list[list[str]] = []
            self.tables.append(t)
            self._open_tables.append(t)
        elif tag == "tr" and self._open_tables:
            row: list[str] = []
            self._open_rows.append(row)
            for t in self._open_tables:
                t.append(row)
        elif tag in ("td", "th") and self._open_rows:
            chunks: list[str] = []
            self._open_cells.append(chunks)
        elif tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.links.append(v)

    def handle_endtag(self, tag: str) -> None:
        if tag in self._SKIP_TEXT_IN:
            self._suppress = max(0, self._suppress - 1)
            return
        if tag == "table" and self._open_tables:
            self._open_tables.pop()
        elif tag == "tr" and self._open_rows:
            self._open_rows.pop()
        elif tag in ("td", "th") and self._open_cells:
            chunks = self._open_cells.pop()
            # get_text(strip=True): strip each chunk, join non-empty with ''
            text = "".join(c.strip() for c in chunks)
            if self._open_rows:
                self._open_rows[-1].append(text)

    def handle_data(self, data: str) -> None:
        if self._suppress:
            return
        for chunks in self._open_cells:
            chunks.append(data)
        if data.strip():
            self._text_chunks.append(data.strip())

    @property
    def text(self) -> str:
        return " ".join(self._text_chunks)


def parse_html(html: str) -> _TableParser:
    p = _TableParser()
    p.feed(html)
    p.close()
    return p


_PRICE_RE = re.compile(r"(\d+,?\d*\.?\d*)")
_DIGIT_RE = re.compile(r"\d+\.?\d*")


def extract_commodity_rows(html: str) -> list[dict]:
    """business_insider row semantics (business_insider.py:114-158):
    ≥3 cells; name filters (P1); first later cell with digits → price
    (comma-stripped regex); first later cell with % or +/- → change."""
    out = []
    for table in parse_html(html).tables:
        for cells in table:
            if len(cells) < 3:
                continue
            name = cells[0]
            if (
                not name
                or len(name) <= 2
                or name.isdigit()
                or "commodity" in name.lower()
                or "price" in name.lower()
            ):
                continue
            price = None
            change = None
            for text in cells[1:]:
                if price is None and _DIGIT_RE.search(text):
                    m = _PRICE_RE.search(text.replace(",", ""))
                    if m:
                        try:
                            price = float(m.group(1))
                        except ValueError:
                            continue
                if change is None and ("%" in text or "+" in text or "-" in text):
                    change = text
            if name and price is not None:
                out.append({"name": name, "price": price, "change": change})
    return out


def extract_simple_rows(html: str) -> list[dict]:
    """simple_generic HTML semantics (simple_generic.py:114-142): ≥2 cells,
    price from cell[1], drop header names {name, symbol, commodity}."""
    out = []
    for table in parse_html(html).tables:
        for cells in table:
            if len(cells) < 2:
                continue
            name, price_text = cells[0], cells[1]
            m = _PRICE_RE.search(price_text.replace(",", ""))
            if m and name and name.lower() not in ("name", "symbol", "commodity"):
                try:
                    out.append({"name": name, "current_price": float(m.group(1))})
                except ValueError:
                    continue
    return out


def extract_links(html: str) -> list[str]:
    return parse_html(html).links


def extract_text(html: str) -> str:
    """The byte-identity contract column (input_hint): stripped visible text
    chunks joined with single spaces, scripts/styles skipped."""
    return parse_html(html).text


# ---------------------------------------------------------------------------
# Spark stages (mapInPandas — Arrow batches, 1→N rows)
# ---------------------------------------------------------------------------

COMMODITY_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("change", T.StringType()),
    ]
)

SIMPLE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("current_price", T.DoubleType()),
    ]
)

LINKS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("link", T.StringType()),
    ]
)

TEXT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("extracted_text", T.StringType()),
    ]
)


def _decode(b) -> str:
    if b is None:
        return ""
    if isinstance(b, (bytes, bytearray)):
        return bytes(b).decode("utf-8", errors="replace")
    return str(b)


def commodity_table_stage(pages: DataFrame) -> DataFrame:
    """pages(url, html) → (url, name, price, change) rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                for r in extract_commodity_rows(_decode(html)):
                    rows.append((url, r["name"], r["price"], r["change"]))
            yield pd.DataFrame(rows, columns=["url", "name", "price", "change"])

    return pages.select("url", "html").mapInPandas(gen, COMMODITY_SCHEMA)


def simple_table_stage(pages: DataFrame) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                for r in extract_simple_rows(_decode(html)):
                    rows.append((url, r["name"], r["current_price"]))
            yield pd.DataFrame(rows, columns=["url", "name", "current_price"])

    return pages.select("url", "html").mapInPandas(gen, SIMPLE_SCHEMA)


def link_stage(pages: DataFrame) -> DataFrame:
    """The 'expand' stage input: href extraction (outlink explosion).
    Relative→absolute resolution happens downstream with native exprs."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                for link in extract_links(_decode(html)):
                    rows.append((url, link))
            yield pd.DataFrame(rows, columns=["url", "link"])

    return pages.select("url", "html").mapInPandas(gen, LINKS_SCHEMA)


def text_stage(pages: DataFrame) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "extracted_text": [extract_text(_decode(h)) for h in pdf["html"]],
                }
            )

    return pages.select("url", "html").mapInPandas(gen, TEXT_SCHEMA)


def resolve_links(links: DataFrame, base_col: str = "url", link_col: str = "link") -> DataFrame:
    """Relative-href resolution with native expressions (no UDF):
    absolute stays; '//host/p' inherits protocol; '/p' inherits authority;
    fragments-only dropped; other relative paths resolved against the base
    directory. Covers the fixture grammar (F-1 class 5)."""
    base = F.col(base_col)
    link = F.col(link_col)
    proto = F.lower(F.try_parse_url(base, F.lit("PROTOCOL")))
    authority = F.try_parse_url(base, F.lit("AUTHORITY"))
    base_path = F.coalesce(F.try_parse_url(base, F.lit("PATH")), F.lit("/"))
    base_dir = F.regexp_replace(base_path, r"[^/]*$", "")
    resolved = (
        F.when(link.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"), link)
        .when(link.startswith("//"), F.concat(proto, F.lit(":"), link))
        .when(link.startswith("/"), F.concat(proto, F.lit("://"), authority, link))
        .when(link.startswith("#"), F.lit(None))
        .otherwise(F.concat(proto, F.lit("://"), authority, base_dir, link))
    )
    return links.withColumn("resolved_url", resolved).filter(
        F.col("resolved_url").isNotNull()
    )


# ---------------------------------------------------------------------------
# JSON API parsing — fully native (S7/S8)
# ---------------------------------------------------------------------------


def coingecko_stage(pages: DataFrame, body_col: str = "html") -> DataFrame:
    """S7 (simple_generic.py:87-112): ``{"coin": {"usd": 117000.0}}`` body →
    (url, name, current_price) rows with change_percent defaulted to 0.0.
    from_json + explode(map) — no Python."""
    body = F.col(body_col).cast("string")
    parsed = F.from_json(body, "map<string, map<string,double>>")
    exploded = pages.select(
        "url", F.explode(parsed).alias("name", "quote")
    )
    return exploded.select(
        "url",
        "name",
        F.col("quote")["usd"].alias("current_price"),
        F.lit(0.0).alias("change_percent"),
    ).filter(F.col("current_price").isNotNull())
