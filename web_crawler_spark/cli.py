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
    p.add_argument("--epoch-capacity", type=int, default=None,
                   help="global fetches per epoch: per-host budgets are "
                        "water-filled from the epoch's frontier demands "
                        "(max-min fair); overflow defers to the next epoch")
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
    p.add_argument("--compact", action="store_true",
                   help="with --catalog: compact + vacuum every table "
                        "(Iceberg rewrite-data-files/expire-snapshots "
                        "equivalent), print stats, exit")
    p.add_argument("--config", default=None, metavar="SETTINGS_YAML",
                   help="reference-shape settings.yaml (pacong/core/config.py"
                        ":88-133): seeds the frontier from enabled scrapers, "
                        "applies scraping.rate_limit_delay and "
                        "output.reports_dir (+ PACONG_* env overrides)")
    p.add_argument("--dump-seeds", action="store_true",
                   help="with --config: print the expanded seed frontier as "
                        "JSON lines and exit")
    return p


KNOWN_SCRAPERS = ["business_insider", "simple_coingecko", "sina_finance", "worldbank"]


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    settings = None
    if args.config:
        from .config import Config

        settings = Config(args.config)
        # file (and PACONG_* env) values become the CLI defaults; explicit
        # flags still win because argparse defaults are only overridden here
        # when the user left them untouched
        defaults = build_parser().parse_args([])
        if args.rate_limit_delay == defaults.rate_limit_delay:
            args.rate_limit_delay = float(
                settings.get("scraping.rate_limit_delay", args.rate_limit_delay)
            )
        if args.output_dir == defaults.output_dir:
            args.output_dir = settings.get("output.reports_dir", args.output_dir)
        if args.scrapers == defaults.scrapers:
            enabled = [
                name for name, cfg in settings.scraper_configs().items()
                if cfg.get("enabled", True)
            ]
            if enabled:
                args.scrapers = enabled

    if args.list_scrapers:
        if settings is not None:
            print("\n".join(settings.scraper_configs()))
        else:
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

    if args.compact:
        if not args.catalog:
            print("--compact requires --catalog", file=sys.stderr)
            spark.stop()
            return 2
        from .sources.catalog import EpochCatalog

        cat = EpochCatalog(args.catalog)
        stats = []
        for t in ("fetched", "extracted", "outlinks", "metrics", "seen", "deferred"):
            if cat.committed_epochs(t):
                s = cat.compact(spark, t)
                s["vacuumed"] = len(cat.vacuum(t))
                stats.append(s)
        print(json.dumps({"compaction": stats}))
        spark.stop()
        return 0

    if args.dump_seeds:
        if settings is None:
            print("--dump-seeds requires --config", file=sys.stderr)
            spark.stop()
            return 2
        from .config import seeds_from_settings

        for line in seeds_from_settings(spark, settings).toJSON().collect():
            print(line)
        spark.stop()
        return 0

    clock = F.lit("2025-07-22 10:00:00").cast("timestamp")
    pages = generate_pages(spark, args.pages_count)

    if args.catalog:
        from .plans.epoch import CrawlEngine
        from .sources.seeds import generate_seeds

        if settings is not None:
            from .config import seeds_from_settings

            seeds = seeds_from_settings(spark, settings)
        else:
            seeds = generate_seeds(spark, n_per_host=5, hot_factor=10, n_epochs=args.epochs)
        engine = CrawlEngine(spark, args.catalog, pages,
                             delay_seconds=args.rate_limit_delay,
                             epoch_fetch_capacity=args.epoch_capacity)
        stats = engine.run(seeds, n_epochs=args.epochs)
        print(json.dumps({"crawl": stats}))

    if settings is not None:
        # config-driven sources (reference factory loop): each enabled
        # scraper with a parser key runs its compiled DSL transform over
        # the corpus and lands in its own parquet output
        for name, df in PL.run_config_sources(pages, settings).items():
            df.write.mode("overwrite").parquet(f"{args.output_dir}/sources/{name}")

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
