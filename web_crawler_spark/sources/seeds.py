"""Deterministic `seeds` frontier fixture (FIXTURES.md F-2).

Mirrors the reference's ``get_data_sources()`` seed lists (config order =
crawl priority, pacong/core/base_scraper.py:43-49) with the fixture
requirements: ≥2 hosts with ≥3 URLs, one hot host with ~10× URLs (skew /
salting), and cross-epoch duplicates (seen-set exercise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import urltools as U


def generate_seeds(
    spark: SparkSession,
    n_per_host: int = 5,
    hot_factor: int = 10,
    n_epochs: int = 3,
    seed: int = 42,
) -> DataFrame:
    """seeds(url, source, priority, host, epoch) — generated with native
    expressions from spark.range (scales to 10^5+ URLs with zipf-ish skew)."""
    hosts = [
        ("markets.businessinsider.com", "business_insider", hot_factor),
        ("finance.sina.com.cn", "sina_finance", 1),
        ("api.coingecko.com", "simple_coingecko", 1),
        ("data.worldbank.org", "worldbank", 1),
        ("example-commodities.net", "simple_generic", 1),
    ]
    frames = []
    for host, source, factor in hosts:
        n = n_per_host * factor
        base = spark.range(0, n * n_epochs).select(
            (F.col("id") % n).alias("i"),
            (F.col("id") / n).cast("int").alias("epoch"),
        )
        # cross-epoch duplicates: ~1/3 of each epoch's URLs repeat epoch 0's
        dup = F.when(
            (F.col("epoch") > 0) & (F.col("i") % 3 == 0), F.col("i")
        ).otherwise(F.col("i") + F.col("epoch") * n)
        frames.append(
            base.select(
                F.concat(
                    F.lit(f"https://{host}/seed/"), dup.cast("string")
                ).alias("url"),
                F.lit(source).alias("source"),
                (F.col("i") + 1).cast("int").alias("priority"),
                F.lit(host).alias("host"),
                F.col("epoch").cast("int").alias("epoch"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return U.with_url_columns(out)
