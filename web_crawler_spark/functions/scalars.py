"""Scalar extraction/cleaning semantics (SURVEY.md §2.8, X1–X16) as
*native* Spark Column expressions — JVM-side, whole-stage-codegen friendly.

Each function reproduces the reference's effective behavior (cited
``file:line`` into /root/reference) including its edge cases. No Python
UDFs here: `float()`-style "None on failure" maps to Spark's null-on-bad
`cast('double')`, which has identical accept/reject behavior for the
string shapes these pipelines produce.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# X1 — clean_price_string (pacong/data/processor.py:22-73)
# ---------------------------------------------------------------------------


def clean_price(col: Column) -> Column:
    """Strip currency junk, disambiguate ',' vs '.' as decimal/thousands,
    cast to double (null when unparseable).

    Semantics (processor.py:43-69): keep only ``[0-9.,-]``; if both ',' and
    '.' present the *rightmost* is the decimal separator; a lone ',' with a
    2-or-fewer-digit tail is a decimal point, otherwise thousands.
    """
    s = F.regexp_replace(F.trim(col.cast("string")), r"[^\d.,-]", "")
    has_comma = s.contains(",")
    has_dot = s.contains(".")
    # last-dot-after-last-comma <=> in the reversed string '.' appears first
    dot_is_decimal = F.instr(F.reverse(s), ".") < F.instr(F.reverse(s), ",")
    parts = F.split(s, ",")
    lone_comma_decimal = (F.size(parts) == 2) & (F.length(F.element_at(parts, 2)) <= 2)
    cleaned = (
        F.when(
            has_comma & has_dot,
            F.when(dot_is_decimal, F.replace(s, F.lit(","), F.lit(""))).otherwise(
                F.replace(F.replace(s, F.lit("."), F.lit("")), F.lit(","), F.lit("."))
            ),
        )
        .when(
            has_comma,
            F.when(lone_comma_decimal, F.replace(s, F.lit(","), F.lit("."))).otherwise(
                F.replace(s, F.lit(","), F.lit(""))
            ),
        )
        .otherwise(s)
    )
    return F.when(cleaned == "", F.lit(None)).otherwise(cleaned).try_cast("double")


# ---------------------------------------------------------------------------
# X2 — clean_percentage_string (pacong/data/processor.py:75-112)
# ---------------------------------------------------------------------------


def clean_percentage(col: Column) -> Column:
    """Like X1 but ','→'.' unconditionally, and values with abs > 100 are
    divided by 100 (processor.py:104-108 — deliberate reference quirk)."""
    s = F.regexp_replace(F.trim(col.cast("string")), r"[^\d.,-]", "")
    s = F.replace(s, F.lit(","), F.lit("."))
    v = F.when(s == "", F.lit(None)).otherwise(s).try_cast("double")
    return F.when(F.abs(v) <= 100.0, v).otherwise(v / 100.0)


# ---------------------------------------------------------------------------
# X3 — extract_commodity_symbol (pacong/data/processor.py:114-140)
# ---------------------------------------------------------------------------

_SYMBOL_PATTERNS = [
    r"([A-Z]+\d*:COM)",  # GC1:COM
    r"([A-Z]+USD:CUR)",  # XAUUSD:CUR
    r"([A-Z]+\d+)",      # GC1
    r"([A-Z]{2,4})",     # generic
]


def extract_symbol(col: Column) -> Column:
    """First match among four ordered regexes; '' when nothing matches."""
    s = col.cast("string")
    candidates = [
        F.nullif(F.regexp_extract(s, p, 1), F.lit("")) for p in _SYMBOL_PATTERNS
    ]
    return F.coalesce(*candidates, F.lit(""))


# ---------------------------------------------------------------------------
# X4 — standardize_commodity_name (pacong/data/processor.py:142-171)
# ---------------------------------------------------------------------------

NAME_MAPPINGS = {
    "Oil (WTI)": "WTI原油",
    "Oil (Brent)": "布伦特原油",
    "Natural Gas": "天然气",
    "Natural Gas (Henry Hub)": "天然气",
    "RBOB Gasoline": "RBOB汽油",
    "Heating Oil": "取暖油",
    "Live Cattle": "活牛",
    "Lean Hog": "瘦肉猪",
    "Feeder Cattle": "饲料牛",
}


def standardize_name(col: Column) -> Column:
    """Whitespace-collapse + 9-entry rename map (identity fallback)."""
    name = F.regexp_replace(F.trim(col.cast("string")), r"\s+", " ")
    expr = None
    for src, dst in NAME_MAPPINGS.items():
        cond = name == src
        expr = F.when(cond, F.lit(dst)) if expr is None else expr.when(cond, F.lit(dst))
    return expr.otherwise(name)


# ---------------------------------------------------------------------------
# X5 — categorize_commodity (pacong/data/processor.py:173-214) and the
# scraper-local variant (pacong/scrapers/business_insider.py:160-185).
# Keyword order matters: first matching category wins.
# ---------------------------------------------------------------------------

_PROCESSOR_CATEGORIES = [
    ("能源", ["oil", "gas", "gasoline", "原油", "天然气", "汽油", "取暖油",
              "heating", "brent", "wti"]),
    ("贵金属", ["gold", "silver", "platinum", "palladium", "黄金", "白银",
                "铂金", "钯金"]),
    ("工业金属", ["copper", "aluminum", "zinc", "nickel", "lead", "tin",
                  "铜", "铝", "锌", "镍", "铅", "锡"]),
    ("农产品", ["corn", "wheat", "soybean", "cotton", "sugar", "coffee",
                "cocoa", "cattle", "hog", "玉米", "小麦", "大豆", "棉花",
                "糖", "咖啡", "可可", "牛", "猪"]),
]

_BI_CATEGORIES = [
    ("能源", ["oil", "gas", "gasoline", "heating", "brent", "wti", "crude"]),
    ("贵金属", ["gold", "silver", "platinum", "palladium"]),
    ("工业金属", ["copper", "aluminum", "aluminium", "zinc", "nickel", "lead",
                  "tin"]),
    ("农产品", ["corn", "wheat", "soybean", "cotton", "sugar", "coffee",
                "cocoa", "cattle", "hog", "lumber", "milk", "orange", "palm",
                "rapeseed", "rice"]),
]


def _contains_any(lower_col: Column, keywords: list[str]) -> Column:
    # substring (not word) containment, mirroring Python `kw in name_lower`
    return lower_col.rlike("|".join(__import__("re").escape(k) for k in keywords))


def categorize(name: Column, symbol: Column | None = None) -> Column:
    """processor.py variant: 4 keyword categories, then symbol fallback
    (com→商品, cur→货币), else 其他."""
    lower = F.lower(name.cast("string"))
    expr = None
    for cat, kws in _PROCESSOR_CATEGORIES:
        cond = _contains_any(lower, kws)
        expr = F.when(cond, F.lit(cat)) if expr is None else expr.when(cond, F.lit(cat))
    if symbol is not None:
        sym = F.lower(symbol.cast("string"))
        expr = expr.when(sym.contains("com"), F.lit("商品"))
        expr = expr.when(sym.contains("cur"), F.lit("货币"))
    return expr.otherwise(F.lit("其他"))


def categorize_business_insider(name: Column) -> Column:
    """business_insider.py:160-185 variant (adds crude/lumber/milk/...;
    no symbol fallback)."""
    lower = F.lower(name.cast("string"))
    expr = None
    for cat, kws in _BI_CATEGORIES:
        cond = _contains_any(lower, kws)
        expr = F.when(cond, F.lit(cat)) if expr is None else expr.when(cond, F.lit(cat))
    return expr.otherwise(F.lit("其他"))


# ---------------------------------------------------------------------------
# X6 — sina hq_str API parse (pacong/scrapers/sina_finance.py:171-196)
# ---------------------------------------------------------------------------


def parse_hq_payload(col: Column) -> dict[str, Column]:
    """``var hq_str_fx_x="t,bid,ask,price,..."`` → typed fields.

    Reference: regex ``var\\s+hq_str_[^=]+=\\s*"([^"]+)"`` then split on ','
    with fields[1..3] → bid/ask/price (empty string → 0.0), fields[0] time.
    """
    data = F.nullif(
        F.regexp_extract(col.cast("string"), r'var\s+hq_str_[^=]+=\s*"([^"]+)"', 1),
        F.lit(""),
    )
    fields = F.split(data, ",")

    def _num(i: int) -> Column:
        raw = F.element_at(fields, i)
        return F.when(raw == "", F.lit(0.0)).otherwise(raw.try_cast("double"))

    return {
        "quote_time": F.element_at(fields, 1),
        "bid_price": _num(2),
        "ask_price": _num(3),
        "current_price": _num(4),
    }


# ---------------------------------------------------------------------------
# X8 — percent extraction from a change string
# (pacong/scrapers/business_insider.py:205-214)
# ---------------------------------------------------------------------------


def extract_change_percent(col: Column) -> Column:
    return F.nullif(
        F.regexp_extract(col.cast("string"), r"([+-]?\d+\.?\d*)%", 1), F.lit("")
    ).try_cast("double")


# ---------------------------------------------------------------------------
# X12 — derived change_percent (pacong/data/models.py:80-84)
# ---------------------------------------------------------------------------


def derive_change_percent(
    change_amount: Column, change_percent: Column, previous_close: Column
) -> Column:
    return F.when(
        change_amount.isNotNull()
        & change_percent.isNull()
        & previous_close.isNotNull()
        & (previous_close != 0),
        change_amount / previous_close * 100.0,
    ).otherwise(change_percent)


# ---------------------------------------------------------------------------
# X13 — forex derivations (pacong/data/models.py:159-179)
# ---------------------------------------------------------------------------


def forex_derived(bid: Column, ask: Column, base: Column, quote: Column) -> dict[str, Column]:
    return {
        "mid_price": (bid + ask) / 2.0,
        "spread": ask - bid,
        "pair": F.concat_ws("/", base, quote),
    }


# ---------------------------------------------------------------------------
# X14 — timestamp coercion with deterministic clock (models.py:35-39)
# ---------------------------------------------------------------------------


def coerce_timestamp(col: Column, epoch_clock: Column) -> Column:
    """ISO-parse strings; fall back to the injected epoch clock (the engine
    replaces the reference's nondeterministic ``datetime.now()``)."""
    return F.coalesce(F.try_to_timestamp(col), epoch_clock)


# ---------------------------------------------------------------------------
# X15/X16 — format checks (pacong/scrapers/generic_scraper.py:364-371)
# ---------------------------------------------------------------------------


def is_valid_url(col: Column) -> Column:
    return F.try_parse_url(col.cast("string"), F.lit("HOST")).isNotNull()


def is_numeric_string(col: Column) -> Column:
    return F.replace(col.cast("string"), F.lit(","), F.lit("")).try_cast("double").isNotNull()
