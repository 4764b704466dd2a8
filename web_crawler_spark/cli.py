"""CLI mirroring the reference's ``python main.py`` flags
(pacong/main.py:21-81): --scrapers/--list-scrapers/--output-format/
--output-dir/--config-ish knobs, driving the Spark pipeline end-to-end.

Usage (spark-submit friendly — see scripts/build_submit_zip.sh):

    python -m web_crawler_spark.cli --pages-count 1000 --output-dir ./reports
    spark-submit --py-files web_crawler_spark.zip -m ...  (cluster mode)
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="web_crawler_spark",
        description="PySpark-native crawl/analytics engine (reference: pacong main.py)",
    )
    p.add_argument("--scrapers", nargs="*", default=["business_insider"],
                   help="sources to run (reference --scrapers)")
    p.add_argument("--list-scrapers", action="store_true")
    p.add_argument("--output-format", choices=["csv", "parquet", "both"], default="both")
    p.add_argument("--output-dir", default="./reports")
    p.add_argument("--pages-count", type=int, default=600,
                   help="synthetic corpus size (offline fetch)")
    p.add_argument("--rate-limit-delay", type=float, default=2.0)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--catalog", default=None, help="epoch-catalog root (enables crawl mode)")
    p.add_argument("--master", default=None)
    p.add_argument("--verbose", "-v", action="store_true")
    p.add_argument("--sql", default=None, metavar="QUERY",
                   help="ad-hoc SQL over the crawl catalog (--catalog tables "
                        "fetched/extracted/outlinks/metrics/seen/deferred as "
                        "views) and/or --tables-dir parquet tables; prints "
                        "JSON lines")
    p.add_argument("--tables-dir", default=None,
                   help="directory of <name>.parquet tables to register as views")
    return p


KNOWN_SCRAPERS = ["business_insider", "simple_coingecko", "sina_finance", "worldbank"]


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.list_scrapers:
        print("\n".join(KNOWN_SCRAPERS))
        return 0

    from .plans import pipeline as PL
    from .plans import report as R
    from .session import get_spark
    from .sources.pages import generate_pages

    spark = get_spark(app_name="web_crawler_spark.cli", master=args.master)
    if not args.verbose:
        spark.sparkContext.setLogLevel("ERROR")

    if args.sql:
        # analytics entry: the engine's tables are just tables — any SQL
        # the reference's fixed pipeline could answer (and any it couldn't)
        # runs here through Catalyst
        import glob
        import os as _os

        if args.tables_dir:
            for pq in glob.glob(_os.path.join(args.tables_dir, "*.parquet")):
                name = _os.path.basename(pq)[: -len(".parquet")]
                spark.read.parquet(pq).createOrReplaceTempView(name)
        if args.catalog:
            from .sources.catalog import EpochCatalog

            cat = EpochCatalog(args.catalog)
            for t in ("fetched", "extracted", "outlinks", "metrics", "seen", "deferred"):
                df = cat.read(spark, t)
                if df is not None:
                    df.createOrReplaceTempView(t)
        for line in spark.sql(args.sql).toJSON().collect():
            print(line)
        spark.stop()
        return 0

    clock = F.lit("2025-07-22 10:00:00").cast("timestamp")
    pages = generate_pages(spark, args.pages_count)

    if args.catalog:
        from .plans.epoch import CrawlEngine
        from .sources.seeds import generate_seeds

        seeds = generate_seeds(spark, n_per_host=5, hot_factor=10, n_epochs=args.epochs)
        engine = CrawlEngine(spark, args.catalog, pages,
                             delay_seconds=args.rate_limit_delay)
        stats = engine.run(seeds, n_epochs=args.epochs)
        print(json.dumps({"crawl": stats}))

    results = PL.run_full_analysis(pages, clock)
    if args.output_format in ("csv", "both"):
        R.write_commodity_csv(results["commodities"], f"{args.output_dir}/commodities_csv")
    if args.output_format in ("parquet", "both"):
        R.write_category_report(results["commodities"], f"{args.output_dir}/by_category")
    R.write_run_result(results["summary"], f"{args.output_dir}/summary")
    print(R.console_summary(results))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
