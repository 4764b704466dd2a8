"""Config-driven extraction DSL (SURVEY §2.8 X9/X10/X11, §2.1 S8, §2.12).

The reference's generic_scraper is a declarative per-source "UDF language":
field rules {selector, attribute, regex, transform}, json_path descent +
field_mapping, regex-parser mode, cleaning rules, format validators
(pacong/scrapers/generic_scraper.py:190-246, 248-312, 314-341, 343-415).

Here the same config dicts COMPILE to native Column expressions — the
registry of scrapers becomes a dict of config → column pipeline, executed
JVM-side. CSS selectors are the one part needing an HTML parser; those run
in the mapInPandas extraction stages (plans/extract.py); everything below
is for the string/JSON payload paths.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# X9 transforms (generic_scraper.py:233-246)
# ---------------------------------------------------------------------------


def compile_transform(col: Column, transform: str) -> Column:
    """transform ∈ {float, lowercase, uppercase, strip_currency}; unknown
    transforms pass through (reference returns value unchanged)."""
    s = col.cast("string")
    if transform == "float":
        # reference: first [\d.,]+ run after comma-strip, else original
        no_comma = F.replace(s, F.lit(","), F.lit(""))
        num = F.regexp_extract(no_comma, r"([\d.]+)", 1)
        return F.when(num != "", num).otherwise(s)
    if transform == "lowercase":
        return F.lower(s)
    if transform == "uppercase":
        return F.upper(s)
    if transform == "strip_currency":
        return F.regexp_replace(s, r"[^\d.,]", "")
    return s


# ---------------------------------------------------------------------------
# X11 field cleaners (generic_scraper.py:404-415)
# ---------------------------------------------------------------------------


def compile_cleaner(col: Column, clean_type: str) -> Column:
    s = F.trim(col.cast("string"))
    if clean_type == "remove_currency":
        return F.regexp_replace(s, r"[^\d.,]", "")
    if clean_type == "normalize_whitespace":
        # reference: ' '.join(value.split())
        return F.trim(F.regexp_replace(s, r"\s+", " "))
    if clean_type == "remove_html":
        # reference uses BS get_text; for scalar columns a tag-strip +
        # entity decode covers the config-driven use (simple payloads)
        stripped = F.regexp_replace(s, r"<[^>]*>", "")
        for ent, ch in [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                        ("&nbsp;", " "), ("&quot;", '"')]:
            stripped = F.replace(stripped, F.lit(ent), F.lit(ch))
        return stripped
    return col


# ---------------------------------------------------------------------------
# X9 field rule: {regex, transform} over a string column
# (selector/attribute variants live in the HTML mapInPandas stage)
# ---------------------------------------------------------------------------


def compile_field_rule(col: Column, rule: str | dict) -> Column:
    if isinstance(rule, str):
        return F.trim(col.cast("string"))
    value = F.trim(col.cast("string"))
    if rule.get("regex"):
        value = F.nullif(F.regexp_extract(value, rule["regex"], 1), F.lit(""))
    if rule.get("transform"):
        value = F.when(
            value.isNotNull(), compile_transform(value, rule["transform"])
        )
    return value


# ---------------------------------------------------------------------------
# X15/X16 format validators (generic_scraper.py:362-375)
# ---------------------------------------------------------------------------


def compile_format_check(col: Column, format_type: str) -> Column:
    from ..functions import scalars as S

    if format_type == "number":
        return S.is_numeric_string(col)
    if format_type == "url":
        return S.is_valid_url(col)
    if format_type == "non_empty":
        return F.trim(col.cast("string")) != ""
    return F.lit(True)


def required_fields_filter(df: DataFrame, required: list[str]) -> DataFrame:
    """P3 (generic_scraper.py:181-183 / simple_generic.py:144-151)."""
    out = df
    for f_name in required:
        out = out.filter(F.col(f_name).isNotNull())
    return out


# ---------------------------------------------------------------------------
# S8: config-driven JSON parse (json_path descent + field_mapping)
# ---------------------------------------------------------------------------


def json_config_stage(
    pages: DataFrame,
    config: dict,
    body_col: str = "body",
    url_col: str = "url",
) -> DataFrame:
    """generic_scraper._parse_json (248-294): dotted json_path descent then
    field_mapping {target: source} projection. List payloads explode; the
    nested CoinGecko shape (keys are item names) maps via map-explode."""
    body = F.col(body_col).cast("string")
    json_path = config.get("json_path", "")
    field_mapping: dict[str, str] = config.get("field_mapping", {})
    path_expr = "$" + "".join(f".{k}" for k in json_path.split(".") if k)
    node = F.get_json_object(body, path_expr) if json_path else body

    if config.get("shape") == "list":
        # payload: [{...}, {...}] → explode, then mapped projection
        items = F.from_json(node, "array<map<string,string>>")
        exploded = pages.select(F.col(url_col).alias("url"), F.explode(items).alias("item"))
        cols = [
            F.col("item")[src].alias(dst) for dst, src in field_mapping.items()
        ]
        return exploded.select("url", *cols)

    # nested dict-of-dicts (CoinGecko): key = name, inner fields mapped
    parsed = F.from_json(node, "map<string, map<string,string>>")
    exploded = pages.select(
        F.col(url_col).alias("url"), F.explode(parsed).alias("name", "fields")
    )
    cols = [
        F.col("fields")[src].alias(dst)
        for dst, src in field_mapping.items()
        if dst != "name"
    ]
    return exploded.select("url", "name", *cols)


# ---------------------------------------------------------------------------
# X10: regex-parser mode (generic_scraper.py:314-341)
# ---------------------------------------------------------------------------


def regex_parser_stage(
    df: DataFrame,
    pattern: str,
    fields: list[str],
    content_col: str = "body",
    url_col: str = "url",
) -> DataFrame:
    """``re.finditer(pattern, MULTILINE|DOTALL)`` with positional groups →
    one row per match with named fields. Native: regexp_extract_all per
    group index, arrays_zip, explode — no Python.

    Java regex needs inline flags for the reference's re.M|re.S: (?sm).
    """
    content = F.col(content_col).cast("string")
    flagged = pattern if pattern.startswith("(?") else "(?sm)" + pattern
    n_groups = re.compile(pattern).groups
    arrays = [
        F.regexp_extract_all(content, F.lit(flagged), i + 1).alias(f"g{i}")
        for i in range(min(n_groups, len(fields)))
    ]
    zipped = df.select(F.col(url_col).alias("url"), F.arrays_zip(*arrays).alias("z"))
    exploded = zipped.select("url", F.explode("z").alias("m"))
    return exploded.select(
        "url", *[F.col("m").getField(f"g{i}").alias(name) for i, name in enumerate(fields[:n_groups])]
    )


# ---------------------------------------------------------------------------
# The scraper registry equivalent (§2.12): config name → compiled pipeline
# ---------------------------------------------------------------------------


class SourceRegistry:
    """pacong/scrapers/factory.py re-imagined: register per-source configs;
    ``build(name)`` returns a DataFrame-transformer closure. Auto-derived
    dynamic classes (simple_generic.py:187-204) become plain dict entries."""

    def __init__(self) -> None:
        self._configs: dict[str, dict] = {}

    def register(self, name: str, config: dict) -> None:
        self._configs[name] = config

    def list_sources(self) -> list[str]:
        return sorted(self._configs)

    def build(self, name: str):
        config = self._configs[name]
        kind = config.get("parser", "json")

        def transform(pages: DataFrame) -> DataFrame:
            if kind == "json":
                out = json_config_stage(pages, config)
            elif kind == "regex":
                out = regex_parser_stage(
                    pages, config["pattern"], config["fields"]
                )
            elif kind == "html":
                # X9 CSS path (generic_scraper.py:140-229): container select
                # + per-field selector/attribute/regex/transform rules in a
                # mapInPandas stage; cleaning/validation stay native below
                from .extract import css_config_stage

                out = css_config_stage(pages, config)
            elif kind == "excel":
                # S6 worldbank path (worldbank.py:60-161): the input rows
                # carry (path, content binary) workbook bytes; header-sniff
                # + latest-value scan per configured sheet
                from ..sources.xlsx import excel_config_stage

                out = excel_config_stage(pages, config)
            else:
                raise ValueError(f"unknown parser kind: {kind}")
            cleaning = config.get("cleaning", {})
            for field, clean_type in cleaning.get("fields", {}).items():
                if field in out.columns:
                    out = out.withColumn(field, compile_cleaner(F.col(field), clean_type))
            for field, transform_type in cleaning.get("transforms", {}).items():
                if field in out.columns:
                    out = out.withColumn(field, compile_transform(F.col(field), transform_type))
            validation = config.get("validation", {})
            required = validation.get("required_fields", [])
            if required:
                out = required_fields_filter(out, required)
            for field, format_type in validation.get("formats", {}).items():
                if field in out.columns:
                    out = out.filter(compile_format_check(F.col(field), format_type))
            return out

        return transform
