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


# host → (source tag, hot multiplier, page classes, class index in
# pages._CLASS_BUILDERS) — must stay in lockstep with sources/pages.py
_HOST_CLASSES = [
    ("markets.businessinsider.com", "business_insider", True,
     ["commodity_table", "nasty"], [0, 5]),
    ("example-commodities.net", "simple_generic", False, ["simple_table"], [1]),
    ("api.coingecko.com", "simple_coingecko", False, ["json_api"], [2]),
    ("finance.sina.com.cn", "sina_finance", False, ["hq_str"], [3]),
    ("data.worldbank.org", "worldbank", False, ["links"], [4]),
]


def seeds_from_pages(
    spark: SparkSession,
    n_pages: int,
    n_per_host: int = 5,
    hot_factor: int = 10,
    n_epochs: int = 3,
    miss_rate: int = 6,
) -> DataFrame:
    """Seeds drawn from the synthetic CORPUS URL space: ~(1 - 1/miss_rate)
    of each epoch's URLs canonicalize to real pages (fetch hits → the
    extraction stage does real work), every miss_rate-th URL points past
    the corpus (fetch error → F5 error isolation). Keeps generate_seeds'
    fixture contract: hot host at hot_factor×, 1/3 of epoch>0 URLs repeat
    epoch 0's (seen-set exercise), priority = list order.

    Pages' URL scheme (pages._build_page): page i has class i%6, path
    ``/{cls}/{i//6}``; the seed URL uses the unsorted-query variant so URL
    canonicalization is genuinely exercised on the hit path."""
    frames = []
    for host, source, hot, classes, idxs in _HOST_CLASSES:
        n = n_per_host * (hot_factor if hot else 1)
        base = spark.range(0, n * n_epochs).select(
            (F.col("id") % n).alias("i"),
            (F.col("id") / n).cast("int").alias("epoch"),
        )
        dup = F.when(
            (F.col("epoch") > 0) & (F.col("i") % 3 == 0), F.col("i")
        ).otherwise(F.col("i") + F.col("epoch") * n)
        pos = (dup % len(classes)).cast("int")
        cls = F.element_at(F.array(*[F.lit(c) for c in classes]), pos + 1)
        cidx = F.element_at(F.array(*[F.lit(x) for x in idxs]), pos + 1)
        # pages with class index c exist for k in [0, (n_pages-1-c)//6]
        max_k = F.floor((F.lit(n_pages - 1) - cidx) / 6)
        k = (dup * 2654435761) % (max_k + 1)  # Knuth-spread over the range
        k = F.when(dup % miss_rate == 0, k + F.lit(n_pages)).otherwise(k)
        frames.append(
            base.select(
                F.concat(
                    F.lit(f"https://{host}/"), cls, F.lit("/"),
                    k.cast("string"), F.lit("?b=2&a=1"),
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
