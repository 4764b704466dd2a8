"""Deterministic synthetic `pages` corpus (FIXTURES.md F-1).

Schema (BASELINE.json input_hint):
    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Content classes exercise every working extraction path of the reference
(SURVEY §2.8): commodity HTML tables with junk rows, simple 2-col tables,
CoinGecko-shaped JSON, sina hq_str payloads (incl. the error shape that
must yield zero rows), outlink pages, and nasty HTML (entities, CJK,
whitespace runs). ``text`` is the golden byte-identity target, computed by
the same pinned contract the engine's text_stage implements.

Everything is seeded — same (seed, n_pages) ⇒ identical corpus anywhere.
Generation happens *distributed*: ``spark.range`` → native columns where
possible, one mapInPandas for the HTML bodies. No driver-side loops, so
the bench can synthesize 10^6–10^7 pages without collecting anything.
"""

from __future__ import annotations

import random
from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.extract import extract_text

EPOCH0 = datetime(2025, 7, 22, 9, 0, 0, tzinfo=timezone.utc)

COMMODITIES = [
    ("Gold", "GC1:COM", 2391.20), ("Silver", "SI1:COM", 28.41),
    ("Platinum", "PL1:COM", 968.30), ("Palladium", "PA1:COM", 912.00),
    ("Oil (WTI)", "CL1:COM", 78.22), ("Oil (Brent)", "CO1:COM", 82.63),
    ("Natural Gas", "NG1:COM", 2.17), ("Heating Oil", "HO1:COM", 2.41),
    ("RBOB Gasoline", "RB1:COM", 2.46), ("Copper", "HG1:COM", 4.48),
    ("Aluminium", "AL1:COM", 1.09), ("Zinc", "ZN1:COM", 1.33),
    ("Nickel", "NI1:COM", 7.61), ("Lead", "PB1:COM", 0.98),
    ("Tin", "TIN:COM", 14.12), ("Corn", "C1:COM", 4.42),
    ("Wheat", "W1:COM", 5.57), ("Soybeans", "S1:COM", 11.81),
    ("Cotton", "CT1:COM", 0.81), ("Sugar", "SB1:COM", 0.19),
    ("Coffee", "KC1:COM", 2.27), ("Cocoa", "CC1:COM", 7.77),
    ("Live Cattle", "LC1:COM", 1.87), ("Lean Hog", "LH1:COM", 0.91),
    ("Milk", "DA1:COM", 0.21), ("Lumber", "LB1:COM", 0.52),
]

COINS = ["bitcoin", "ethereum", "solana", "cardano", "dogecoin"]

HOSTS = [
    "markets.businessinsider.com",
    "finance.sina.com.cn",
    "api.coingecko.com",
    "data.worldbank.org",
    "example-commodities.net",
]

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def _commodity_table_html(rng: random.Random, scale: int = 1) -> str:
    """Class 1: Business-Insider shape with junk rows the filters must drop.
    ``scale`` multiplies page size (realistic pages are tens of KB; scale=1
    keeps the original byte-identical fixture output)."""
    rows = ['<tr><th>Commodity</th><th>Price</th><th>Change</th></tr>']
    n = rng.randint(5, len(COMMODITIES))
    if scale > 1:
        n += (scale - 1) * len(COMMODITIES)
    for name, sym, base in [COMMODITIES[rng.randrange(len(COMMODITIES))] for _ in range(n)] if scale > 1 else rng.sample(COMMODITIES, n):
        price = round(base * (1 + rng.uniform(-0.05, 0.05)), 2)
        pct = round(rng.uniform(-4, 4), 2)
        sign = "+" if pct >= 0 else ""
        price_s = f"{price:,.2f}"
        rows.append(
            f"<tr><td>{name}</td><td>{price_s}</td>"
            f"<td>{sign}{pct:.2f}%</td><td>{sym}</td></tr>"
        )
    # junk rows: short name, all-digit name, keyword rows
    rows.append("<tr><td>AB</td><td>12.0</td><td>+1%</td></tr>")
    rows.append("<tr><td>12345</td><td>9.0</td><td>-1%</td></tr>")
    rows.append("<tr><td>Price Index</td><td>3.0</td><td>+0.1%</td></tr>")
    return "<html><body><h1>Markets</h1><table>" + "".join(rows) + "</table></body></html>"


def _simple_table_html(rng: random.Random, scale: int = 1) -> str:
    """Class 2: generic 2-col name/price table with a header row."""
    rows = ["<tr><td>Name</td><td>Price</td></tr>"]
    n = rng.randint(3, 10)
    if scale > 1:
        n += (scale - 1) * len(COMMODITIES)
    for name, _sym, base in [COMMODITIES[rng.randrange(len(COMMODITIES))] for _ in range(n)] if scale > 1 else rng.sample(COMMODITIES, n):
        rows.append(f"<tr><td>{name}</td><td>${base * (1 + rng.uniform(-0.02, 0.02)):.2f}</td></tr>")
    return "<html><body><table>" + "".join(rows) + "</table></body></html>"


def _json_body(rng: random.Random) -> str:
    items = rng.sample(COINS, rng.randint(2, len(COINS)))
    inner = ",".join(f'"{c}":{{"usd":{rng.uniform(0.1, 120000):.2f}}}' for c in items)
    return "{" + inner + "}"


def _hq_payload(rng: random.Random) -> str:
    if rng.random() < 0.2:  # the error shape → must extract zero rows
        return '({"__ERROR":3,"msg":"forbidden"})'
    bid = rng.uniform(4.0, 4.2)
    return (
        f'var hq_str_fx_scnytwd="09:54:{rng.randint(10, 59)},{bid:.6f},'
        f'{bid + 0.002:.6f},{bid + 0.001:.6f},2025-07-22,09:54:41";'
    )


def _links_html(rng: random.Random, host: str, scale: int = 1) -> str:
    links = scale > 1 and [
        f"https://{host}/page{rng.randint(0, 99)}" for _ in range((scale - 1) * 6)
    ] or []
    links += [
        f"https://{host}/page{rng.randint(0, 99)}",
        f"/section/{rng.randint(0, 9)}/item",
        f"relative/{rng.randint(0, 9)}.html",
        "#fragment-only",
        f"//{rng.choice(HOSTS)}/proto-relative",
        f"https://{host.upper()}/page{rng.randint(0, 99)}?b=2&a=1#frag",
    ]
    body = "".join(f'<a href="{u}">link</a> ' for u in links)
    return f"<html><body><p>Index page with outlinks.</p>{body}</body></html>"


def _nasty_html(rng: random.Random, scale: int = 1) -> str:
    """Class 6: nested tables, entities, CJK, whitespace runs."""
    if scale > 1:
        blocks = "".join(
            f"<table><tr><td>块{rng.randint(0, 999)}</td><td>{rng.uniform(1, 999):.2f}</td>"
            f"<td>+{rng.uniform(0, 5):.1f}%</td></tr></table>"
            for _ in range((scale - 1) * 8)
        )
        return "<html><body>" + blocks + "<p>  空白   run&nbsp; 混合 CJK  </p></body></html>"
    return (
        "<html><body><table><tr><td>Outer   A&amp;B</td><td>"
        "<table><tr><td>内部表格</td><td>1,234.56</td><td>+0.5%</td></tr></table>"
        "</td><td>99.9</td></tr></table>"
        "<p>  空白   run&nbsp;&lt;tag&gt; 混合 CJK 文本  </p></body></html>"
    )


_CLASS_BUILDERS = [
    ("commodity_table", _commodity_table_html, "markets.businessinsider.com", "en"),
    ("simple_table", _simple_table_html, "example-commodities.net", "en"),
    ("json_api", _json_body, "api.coingecko.com", "en"),
    ("hq_str", _hq_payload, "finance.sina.com.cn", "zh"),
    ("links", _links_html, "data.worldbank.org", "en"),
    ("nasty", _nasty_html, "markets.businessinsider.com", "zh"),
]


def _build_page(i: int, seed: int, scale: int = 1) -> tuple[str, datetime, bytes, str, str]:
    rng = random.Random((seed << 20) ^ i)
    cls, builder, host, lang = _CLASS_BUILDERS[i % len(_CLASS_BUILDERS)]
    if cls == "links":
        html = builder(rng, host, scale)
    elif cls in ("json_api", "hq_str"):
        html = builder(rng)  # API payloads stay small at any scale
    else:
        html = builder(rng, scale)
    # URL variants that canonicalize identically (F-1 dup-variant requirement)
    variant = i % 4
    path = f"/{cls}/{i // len(_CLASS_BUILDERS)}"
    if variant == 0:
        url = f"https://{host}{path}?a=1&b=2"
    elif variant == 1:
        url = f"https://{host.upper()}{path}?b=2&a=1"
    elif variant == 2:
        url = f"https://{host}:443{path}?a=1&b=2#frag"
    else:
        url = f"https://{host}{path}?b=2&a=1#other"
    ts = EPOCH0 + timedelta(seconds=i % 86400)
    text = extract_text(html) if cls not in ("json_api", "hq_str") else html
    return url, ts.replace(tzinfo=None), html.encode("utf-8"), text, lang


def generate_pages(spark: SparkSession, n_pages: int = 1000, seed: int = 42,
                   partitions: int | None = None, scale: int = 1) -> DataFrame:
    """Distributed corpus synthesis: spark.range → mapInPandas(build).
    ``scale`` multiplies page size (~400 B at 1, ~N*2 KB at N) — scale=1 is
    byte-identical to the original fixture."""
    base = spark.range(0, n_pages, numPartitions=partitions or max(8, n_pages // 50_000))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_build_page(int(i), seed, scale) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return base.mapInPandas(gen, PAGES_SCHEMA)
