"""Golden tests for X1–X16 scalar semantics (SURVEY §5.2.1).

Expected values are computed by PURE-PYTHON oracles implementing the
reference algorithms exactly as written (cited file:line), so any engine
drift from reference behavior fails here without needing the reference
repo importable.
"""

import re

import pytest
from pyspark.sql import functions as F

from web_crawler_spark.functions import scalars as S


# -- pure-python oracles (transcribed semantics, not code) -------------------

def ref_clean_price(price_str):
    """pacong/data/processor.py:22-73"""
    if not price_str:
        return None
    price_str = str(price_str).strip()
    if not price_str:
        return None
    try:
        price_str = re.sub(r"[^\d.,-]", "", price_str)
        if "," in price_str and "." in price_str:
            if price_str.rfind(".") > price_str.rfind(","):
                price_str = price_str.replace(",", "")
            else:
                price_str = price_str.replace(".", "").replace(",", ".")
        elif "," in price_str:
            parts = price_str.split(",")
            if len(parts) == 2 and len(parts[1]) <= 2:
                price_str = price_str.replace(",", ".")
            else:
                price_str = price_str.replace(",", "")
        return float(price_str)
    except (ValueError, TypeError):
        return None


def ref_clean_percentage(percent_str):
    """pacong/data/processor.py:75-112"""
    if not percent_str:
        return None
    percent_str = str(percent_str).strip()
    if not percent_str:
        return None
    try:
        percent_str = re.sub(r"[^\d.,-]", "", percent_str)
        percent_str = percent_str.replace(",", ".")
        value = float(percent_str)
        return value if abs(value) <= 100 else value / 100
    except (ValueError, TypeError):
        return None


def ref_extract_symbol(text):
    """pacong/data/processor.py:114-140"""
    if not text:
        return ""
    for pattern in [r"([A-Z]+\d*:COM)", r"([A-Z]+USD:CUR)", r"([A-Z]+\d+)", r"([A-Z]{2,4})"]:
        m = re.search(pattern, text)
        if m:
            return m.group(1)
    return ""


def ref_categorize(name, symbol=""):
    """pacong/data/processor.py:173-214"""
    nl, sl = name.lower(), symbol.lower()
    if any(k in nl for k in ['oil', 'gas', 'gasoline', '原油', '天然气', '汽油', '取暖油', 'heating', 'brent', 'wti']):
        return "能源"
    if any(k in nl for k in ['gold', 'silver', 'platinum', 'palladium', '黄金', '白银', '铂金', '钯金']):
        return "贵金属"
    if any(k in nl for k in ['copper', 'aluminum', 'zinc', 'nickel', 'lead', 'tin', '铜', '铝', '锌', '镍', '铅', '锡']):
        return "工业金属"
    if any(k in nl for k in ['corn', 'wheat', 'soybean', 'cotton', 'sugar', 'coffee', 'cocoa', 'cattle', 'hog',
                             '玉米', '小麦', '大豆', '棉花', '糖', '咖啡', '可可', '牛', '猪']):
        return "农产品"
    if 'com' in sl:
        return "商品"
    if 'cur' in sl:
        return "货币"
    return "其他"


PRICE_CASES = [
    "1,234.56", "1.234,56", "1,23", "1,234", "$45.00/bbl", "+1.23%", "-0.5",
    "abc", "", "  ", "2,000,000", "-968.30", "12", "0.0001", "1,2,3", "5.",
    ".5", "-", "--", "1.2.3", "€9.999,95", "  77  ",
]

PCT_CASES = [
    "+1.23%", "-0.50%", "+150%", "abc", "", "-0,5%", "3.3%", "250.75%",
    "-101%", "100%", "100.01%", "+0.0%", "1,5%",
]

SYM_CASES = [
    "GC1:COM", "XAUUSD:CUR", "GC1", "AU", "xx", "Gold GC1:COM spot",
    "price XAUUSD:CUR now", "ab CD ef", "A", "ABCDE", "",
]

NAME_CASES = [
    ("Gold", "GC1:COM"), ("Oil (WTI)", ""), ("Soybean Meal", ""),
    ("随便什么 黄金", ""), ("Unknown Thing", "X:COM"), ("Misc", "XAUUSD:CUR"),
    ("Misc", ""), ("Heating Oil", ""), ("Tin", "TIN:COM"), ("LEAD", ""),
]


def _run_scalar(spark, values, expr_builder, in_type="string"):
    df = spark.createDataFrame([(v,) for v in values], f"v {in_type}")
    return [r["out"] for r in df.select(expr_builder(F.col("v")).alias("out")).collect()]


def test_clean_price_golden(spark):
    got = _run_scalar(spark, PRICE_CASES, S.clean_price)
    want = [ref_clean_price(v) for v in PRICE_CASES]
    assert got == pytest.approx(want, nan_ok=True) or got == want, list(
        zip(PRICE_CASES, got, want)
    )


def test_clean_percentage_golden(spark):
    got = _run_scalar(spark, PCT_CASES, S.clean_percentage)
    want = [ref_clean_percentage(v) for v in PCT_CASES]
    assert got == want, list(zip(PCT_CASES, got, want))


def test_extract_symbol_golden(spark):
    got = _run_scalar(spark, SYM_CASES, S.extract_symbol)
    want = [ref_extract_symbol(v) for v in SYM_CASES]
    assert got == want, list(zip(SYM_CASES, got, want))


def test_categorize_golden(spark):
    df = spark.createDataFrame(NAME_CASES, "name string, sym string")
    got = [
        r["out"]
        for r in df.select(S.categorize(F.col("name"), F.col("sym")).alias("out")).collect()
    ]
    want = [ref_categorize(n, s) for n, s in NAME_CASES]
    assert got == want, list(zip(NAME_CASES, got, want))


def test_standardize_name(spark):
    cases = ["Oil (WTI)", "  Natural   Gas ", "Lean Hog", "Gold", " x  y "]
    got = _run_scalar(spark, cases, S.standardize_name)
    assert got == ["WTI原油", "天然气", "瘦肉猪", "Gold", "x y"]


def test_hq_parse(spark):
    payload = 'var hq_str_fx_scnytwd="09:54:32,4.095200,4.097000,4.090000,2025-07-22,09:54:41";'
    err = '({"__ERROR":3,"msg":"forbidden"})'
    df = spark.createDataFrame([(payload,), (err,)], "v string")
    parsed = S.parse_hq_payload(F.col("v"))
    rows = df.select(
        parsed["quote_time"].alias("t"),
        parsed["bid_price"].alias("b"),
        parsed["ask_price"].alias("a"),
        parsed["current_price"].alias("p"),
    ).collect()
    assert rows[0]["t"] == "09:54:32"
    assert rows[0]["b"] == pytest.approx(4.0952)
    assert rows[0]["a"] == pytest.approx(4.097)
    assert rows[0]["p"] == pytest.approx(4.09)
    # error shape (reference reports/sina_api_response...) → all null
    assert rows[1]["t"] is None and rows[1]["b"] is None


def test_change_percent_extract(spark):
    cases = ["+1.23%", "-0.5%", "no pct", "", "12%", "+.5%"]
    got = _run_scalar(spark, cases, S.extract_change_percent)
    # reference regex ([+-]?\d+\.?\d*)% requires a leading digit
    assert got == [1.23, -0.5, None, None, 12.0, 5.0]


def test_forex_derived(spark):
    df = spark.createDataFrame([(4.0952, 4.0970)], "bid double, ask double")
    d = S.forex_derived(F.col("bid"), F.col("ask"), F.lit("CNY"), F.lit("TWD"))
    row = df.select(
        d["mid_price"].alias("m"), d["spread"].alias("s"), d["pair"].alias("p")
    ).collect()[0]
    assert row["m"] == pytest.approx(4.0961)
    assert row["s"] == pytest.approx(0.0018)
    assert row["p"] == "CNY/TWD"
