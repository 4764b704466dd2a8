"""End-to-end analysis pipeline — the engine's equivalent of the
reference's ``run_full_analysis`` (pacong/services/commodity_service.py:
266-301): collect → process/normalize → validate → merge-dups → summary +
top-k → sinks.

The whole thing is ONE declarative DataFrame chain; Catalyst fuses the
process/validate projections into the extraction scan, and the only
shuffles are the dedup window and the final aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import scalars as S
from ..operators import aggregate as A
from ..operators import dedup as D
from ..operators import validate as V
from . import extract as X


def process_commodity(raw: DataFrame, clock: Column) -> DataFrame:
    """DataProcessor._process_commodity_item (processor.py:249-294) as one
    projection: standardize name, extract symbol, clean price/change,
    derive change_percent, categorize. Drops rows without name/price."""
    name = S.standardize_name(F.col("name"))
    symbol = S.extract_symbol(F.coalesce(F.col("symbol"), F.lit("")))
    price = S.clean_price(F.coalesce(F.col("price"), F.col("current_price")))
    change = F.coalesce(F.col("change").cast("string"), F.lit(""))
    change_has_pct = change.contains("%")
    parsed_pct = S.clean_percentage(change)
    change_percent = F.coalesce(
        F.col("change_percent"),
        F.when(change_has_pct, parsed_pct),
    )
    change_amount = F.when(
        (change != "") & ~change_has_pct, S.clean_price(change)
    )
    out = raw.select(
        name.alias("name"),
        symbol.alias("symbol"),
        price.alias("current_price"),
        price.alias("value"),
        change_amount.alias("change_amount"),
        change_percent.alias("change_percent"),
        S.categorize(name, symbol).alias("category"),
        F.coalesce(F.col("source"), F.lit("")).alias("source"),
        S.coerce_timestamp(F.col("timestamp"), clock).alias("timestamp"),
        # CommodityData optional fields (models.py:56-63) — absent in HTML
        # table sources, present for API sources; kept nullable for V6
        F.lit(None).cast("double").alias("high_price"),
        F.lit(None).cast("double").alias("low_price"),
        F.lit(None).cast("double").alias("previous_close"),
    )
    return out.filter((F.col("name") != "") & F.col("current_price").isNotNull())


def process_forex(raw: DataFrame, clock: Column) -> DataFrame:
    """DataProcessor._process_forex_item (processor.py:296-333): pair split
    (first '/' only), price cleaning, mid := current."""
    pair_raw = F.coalesce(F.col("pair"), F.col("currency_pair"), F.lit(""))
    has_slash = pair_raw.contains("/")
    base = F.when(has_slash, F.trim(F.substring_index(pair_raw, "/", 1))).otherwise(
        F.trim(F.coalesce(F.col("base_currency"), F.lit("")))
    )
    quote = F.when(
        has_slash,
        F.trim(F.expr("substring(pair_raw_c, instr(pair_raw_c, '/') + 1)")),
    ).otherwise(F.trim(F.coalesce(F.col("quote_currency"), F.lit(""))))
    pair = F.when(has_slash, pair_raw).otherwise(
        F.when((base != "") & (quote != ""), F.concat(base, F.lit("/"), quote)).otherwise(pair_raw)
    )
    current = S.clean_price(F.coalesce(F.col("current_price"), F.col("price")))
    return raw.withColumn("pair_raw_c", pair_raw).select(
        pair.alias("pair"),
        base.alias("base_currency"),
        quote.alias("quote_currency"),
        S.clean_price(F.col("bid_price")).alias("bid_price"),
        S.clean_price(F.col("ask_price")).alias("ask_price"),
        current.alias("mid_price"),
        current.alias("current_price"),
        F.coalesce(F.col("source"), F.lit("")).alias("source"),
        S.coerce_timestamp(F.col("timestamp"), clock).alias("timestamp"),
    )


def run_full_analysis(
    pages: DataFrame, clock: Column, top_k: int = 5
) -> dict[str, DataFrame]:
    """Offline-corpus equivalent of commodity_service.run_full_analysis."""
    raw = X.commodity_table_stage(pages).select(
        F.col("name"),
        F.lit(None).cast("string").alias("symbol"),
        F.col("price").cast("string").alias("price"),
        F.lit(None).cast("string").alias("current_price"),
        F.col("change"),
        F.lit(None).cast("double").alias("change_percent"),
        F.lit("business_insider").alias("source"),
        F.lit(None).cast("timestamp").alias("timestamp"),
    )
    processed = process_commodity(raw, clock)
    with_errors = V.apply_rules(
        processed, V.commodity_rules(clock), V.commodity_business_rules()
    )
    valid, invalid = V.split_valid(with_errors)
    merged = D.merge_duplicates(valid, keys=["name", "symbol"], tiebreakers=["source"])
    return {
        "commodities": merged,
        "rejected": invalid,
        "summary": A.market_summary(merged),
        "by_category": A.category_stats(merged),
        "top_gainers": A.top_k(merged, "change_percent", top_k, False, "name"),
        "top_losers": A.top_k(merged, "change_percent", top_k, True, "name"),
        "validation_summary": V.validation_summary(invalid),
    }


def run_config_sources(pages: DataFrame, settings) -> dict[str, DataFrame]:
    """Config-driven extraction over the offline corpus — the engine's
    equivalent of the reference's factory loop (scrapers/factory.py +
    main.py --scrapers): every enabled scraper config that declares a
    ``parser`` (html = X9 CSS rules, json = S8 json_path/field_mapping,
    regex = X10) compiles through SourceRegistry into a DataFrame
    transform and runs against the same pages.

    Returns {scraper_name: DataFrame}. The pages are exposed with both an
    ``html`` column (CSS path) and a string ``body`` alias (json/regex
    paths), matching the stage defaults.
    """
    from .dsl import SourceRegistry

    prepared = pages.select(
        "url",
        F.col("html"),
        F.col("html").cast("string").alias("body"),
    )
    registry = SourceRegistry()
    out: dict[str, DataFrame] = {}
    for name, cfg in settings.scraper_configs().items():
        if not cfg.get("enabled", True) or "parser" not in cfg:
            continue
        registry.register(name, cfg)
        out[name] = registry.build(name)(prepared)
    return out


def write_report(results: dict[str, DataFrame], out_dir: str) -> None:
    """S9/S11 sinks: CSV report (16-col projection equivalent) + partitioned
    parquet by category (the Excel one-sheet-per-category analogue)."""
    results["commodities"].select(
        "name", "symbol", "current_price", "change_amount", "change_percent",
        "category", "source", "timestamp",
    ).coalesce(1).write.mode("overwrite").option("header", True).csv(
        f"{out_dir}/commodities_csv"
    )
    results["commodities"].write.mode("overwrite").partitionBy("category").parquet(
        f"{out_dir}/commodities_by_category"
    )
    results["summary"].coalesce(1).write.mode("overwrite").json(f"{out_dir}/summary")
