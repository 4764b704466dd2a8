"""Deterministic raw_records / forex_records fixtures (FIXTURES.md F-3/F-4).

String-typed price/change on purpose — these drive the X1/X2/X3/X8 cleaning
goldens and V1-V8 validation splits. Every edge case from the reference
appears at least once (comma-decimal, the /100 percentage rule, symbols of
each priority class, invalid forex rows of each rejection kind).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession

CLOCK = datetime(2025, 7, 22, 10, 0, 0)

RAW_RECORDS = [
    # (name, symbol, price, change, change_percent, source)
    ("Gold", "GC1:COM", "2,391.20", "+1.23%", None, "business_insider"),
    ("Silver", "SI1:COM", "28.41", "-0.50%", None, "business_insider"),
    ("Oil (WTI)", "CL1:COM", "78.22", "+0.8", None, "business_insider"),
    ("Oil (Brent)", "CO1:COM", "82.63", None, 1.1, "business_insider"),
    ("Natural Gas", "NG1:COM", "2.17", "-2.10%", None, "business_insider"),
    ("Copper", "HG1", "4.48", "+0.02", None, "simple_generic"),
    ("Wheat", "W1:COM", "5.57", "+150%", None, "business_insider"),  # pct>100 → /100
    ("Corn", "C1:COM", "1.234,56", "-0,5%", None, "sina_finance"),   # EU decimal
    ("Sugar", "SB1:COM", "1,23", "+0.1%", None, "sina_finance"),     # lone-comma decimal
    ("Cocoa", "CC1:COM", "$7,777.77/t", "+3.3%", None, "worldbank"), # currency junk
    ("Coffee", "XAUUSD:CUR", "2.27", "", None, "worldbank"),
    ("Lumber", "AU", "0.52", "abc", None, "worldbank"),              # unparseable change
    ("", "GC1:COM", "1.0", "+1%", None, "business_insider"),         # empty name
    ("Nickel", "NI1:COM", "abc", "+1%", None, "business_insider"),   # unparseable price
    ("Zinc", "ZN1:COM", "", "+1%", None, "business_insider"),        # empty price
    ("Gold", "GC1:COM", "2,400.00", "+1.50%", None, "sina_finance"), # dup key (merge)
    ("Platinum", "PL1:COM", "-968.30", "-1%", None, "business_insider"),  # negative price
    ("Tin", "TIN:COM", "2,000,000", "+1%", None, "business_insider"),     # > max range
]


def generate_raw_records(spark: SparkSession) -> DataFrame:
    rows = [
        (name, sym, price, change, pct, src, CLOCK - timedelta(minutes=i))
        for i, (name, sym, price, change, pct, src) in enumerate(RAW_RECORDS)
    ]
    return spark.createDataFrame(
        rows,
        "name string, symbol string, price string, change string,"
        " change_percent double, source string, timestamp timestamp",
    )


FOREX_RECORDS = [
    # (pair, bid, ask, mid, ts_offset_h)  — valid + each rejection class
    ("CNY/TWD", 4.0952, 4.0970, 4.0961, 0),
    ("USD/EUR", 0.9180, 0.9184, 0.9182, 1),
    ("GBP/USD", 1.2911, 1.2915, 1.2913, 2),
    ("usd/jpy", 157.10, 157.14, 157.12, 0),     # malformed pair (lowercase)
    ("USD/CHF", 0.9000, 0.8000, 0.8500, 0),     # bid > ask
    ("AUD/USD", 0.6600, 0.7400, 0.7000, 0),     # spread > 10% of bid
    ("NZD/USD", 0.6100, 0.6104, 0.9999, 0),     # wrong mid
    ("EUR/JPY", 169.20, 169.26, 169.23, 30),    # stale (>24h)
]


def generate_forex_records(spark: SparkSession) -> DataFrame:
    rows = [
        (
            pair,
            pair.split("/")[0],
            pair.split("/")[1],
            bid,
            ask,
            mid,
            mid,
            "sina_finance",
            CLOCK - timedelta(hours=off),
        )
        for pair, bid, ask, mid, off in FOREX_RECORDS
    ]
    return spark.createDataFrame(
        rows,
        "pair string, base_currency string, quote_currency string,"
        " bid_price double, ask_price double, mid_price double,"
        " current_price double, source string, timestamp timestamp",
    )
