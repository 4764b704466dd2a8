"""Validation operators (SURVEY §2.9, V1–V9) — the reference's per-row rule
engine (pacong/data/validator.py) re-expressed as boolean-column builders
that collect error strings into an ``errors`` array and split the batch
into valid rows + a rejected side output, in ONE pass (no per-row Python).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    """One validation rule = (predicate builder, error message builder)."""

    field_name: str
    check: Callable[[Column], Column]          # True ⇒ valid
    message: Callable[[Column], Column]        # error string when invalid


def not_null_rule(field_name: str) -> Rule:
    """V1 (validator.py:35-44): non-null and non-empty-string."""
    return Rule(
        field_name,
        lambda c: c.isNotNull() & (c.cast("string") != ""),
        lambda c: F.lit(f"{field_name}: not_null"),
    )


def numeric_range_rule(
    field_name: str, min_val: float | None = None, max_val: float | None = None
) -> Rule:
    """V2 (validator.py:47-68): castable to double and inside [min,max].
    Nulls pass (reference: optional fields only validated when present —
    the getattr default makes missing fields None and float(None) fails,
    but current_price is required upstream; we pin null-passes which is the
    effective behavior for optional numeric fields)."""

    def check(c: Column) -> Column:
        v = c.try_cast("double")
        ok = F.when(c.isNull(), F.lit(True)).otherwise(v.isNotNull())
        if min_val is not None:
            ok = ok & F.when(c.isNull(), F.lit(True)).otherwise(v >= min_val)
        if max_val is not None:
            ok = ok & F.when(c.isNull(), F.lit(True)).otherwise(v <= max_val)
        return ok

    return Rule(
        field_name,
        check,
        lambda c: F.concat(F.lit(f"{field_name}: range["), F.lit(f"{min_val},{max_val}] got "), c.cast("string")),
    )


def regex_rule(field_name: str, pattern: str) -> Rule:
    """V3 (validator.py:71-82): re.match ⇒ anchored-at-start rlike."""
    anchored = pattern if pattern.startswith("^") else "^" + pattern
    return Rule(
        field_name,
        lambda c: c.cast("string").rlike(anchored),
        lambda c: F.concat(F.lit(f"{field_name}: regex "), c.cast("string")),
    )


def timestamp_rule(field_name: str, max_age_hours: int, now: Column) -> Rule:
    """V4 (validator.py:85-113) with an injected deterministic clock:
    not older than max_age_hours, not more than 1h in the future."""
    return Rule(
        field_name,
        lambda c: c.isNotNull()
        & (c >= now - F.expr(f"INTERVAL {max_age_hours} HOURS"))
        & (c <= now + F.expr("INTERVAL 1 HOURS")),
        lambda c: F.lit(f"{field_name}: stale_or_future"),
    )


# Rule tables (validator.py:123-145) -----------------------------------------


def commodity_rules(now: Column) -> list[Rule]:
    return [
        not_null_rule("name"),
        numeric_range_rule("current_price", 0, 1_000_000),
        numeric_range_rule("change_percent", -100, 1000),
        timestamp_rule("timestamp", 48, now),
    ]


def forex_rules(now: Column) -> list[Rule]:
    return [
        not_null_rule("pair"),
        regex_rule("pair", r"^[A-Z]{3}/[A-Z]{3}$"),
        numeric_range_rule("bid_price", 0, None),
        numeric_range_rule("ask_price", 0, None),
        timestamp_rule("timestamp", 24, now),
    ]


def commodity_business_rules() -> list[tuple[Column, str]]:
    """V6 (validator.py:231-253): (valid-predicate, error-tag) pairs.
    Truthiness caveat: the reference guards with ``if data.x`` so 0/None
    both skip a check — reproduced with ``isNotNull() & (x != 0)``."""
    p = F.col("current_price")
    v = F.col("value")
    hi, lo = F.col("high_price"), F.col("low_price")
    cp = F.col("change_percent")
    present = lambda c: c.isNotNull() & (c != 0)  # noqa: E731
    return [
        (~(present(p) & present(v) & (F.abs(p - v) > 0.001)), "price_vs_value"),
        (~(present(hi) & present(lo) & (hi < lo)), "high_lt_low"),
        (~(present(p) & present(hi) & (p > hi)), "price_gt_high"),
        (~(present(p) & present(lo) & (p < lo)), "price_lt_low"),
        (~(present(cp) & (F.abs(cp) > 50)), "change_gt_50"),
    ]


def forex_business_rules() -> list[tuple[Column, str]]:
    """V7 (validator.py:255-275)."""
    bid, ask, mid = F.col("bid_price"), F.col("ask_price"), F.col("mid_price")
    present = lambda c: c.isNotNull() & (c != 0)  # noqa: E731
    both = present(bid) & present(ask)
    return [
        (~(both & (bid > ask)), "bid_gt_ask"),
        (~(both & ((ask - bid) > bid * 0.1)), "spread_gt_10pct"),
        (
            ~(
                present(mid)
                & both
                & (F.abs(mid - (bid + ask) / 2.0) > 0.0001)
            ),
            "mid_mismatch",
        ),
    ]


def apply_rules(
    df: DataFrame,
    rules: list[Rule],
    business: list[tuple[Column, str]] | None = None,
    errors_col: str = "errors",
) -> DataFrame:
    """Attach an ``errors`` array column; empty array ⇒ row is valid."""
    checks = []
    for r in rules:
        c = F.col(r.field_name)
        checks.append(F.when(~r.check(c), r.message(c)))
    for pred, tag in business or []:
        checks.append(F.when(~pred, F.lit(f"business: {tag}")))
    return df.withColumn(errors_col, F.array_compact(F.array(*checks)))


def split_valid(
    df: DataFrame, errors_col: str = "errors"
) -> tuple[DataFrame, DataFrame]:
    """V8 (validator.py:277-318): (valid rows, rejected side output)."""
    valid = df.filter(F.size(errors_col) == 0).drop(errors_col)
    invalid = df.filter(F.size(errors_col) > 0)
    return valid, invalid


def validation_summary(invalid: DataFrame, errors_col: str = "errors") -> DataFrame:
    """A6 (validator.py:320-344): error counts by type prefix, most-common
    first."""
    return (
        invalid.select(F.explode(errors_col).alias("error"))
        .select(F.split("error", ":").getItem(0).alias("error_type"))
        .groupBy("error_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "error_type")
    )
