"""The crawl epoch loop (north_rule core; SURVEY §7.2.5).

One epoch = one BFS wave:

    frontier(epoch)
      → canonicalize + hash                      (native exprs)
      → ANTI-JOIN vs seen (+ bloom pre-filter)   [shuffle 1: by url_hash]
      → repartition by salted host               [shuffle 2: by host-salt]
      → per-host crawl order + politeness window (row_number / closed form)
      → "fetch" = equi-join against the pages corpus on canonical_url
        (the offline corpus replaces live HTTP — SURVEY §2.1 S1)
      → extract (mapInPandas: tables / links / text)
      → expand: resolved outlinks become epoch+1 frontier candidates
      → commit fetched/seen/metrics snapshots    (EpochCatalog — resumable)

Explicit repartitioning between expand and dedup is mandated by the
north_rule — expand explodes by fan-out (skewed by page), dedup needs
url_hash co-location, scheduling needs host co-location. Two shuffles,
both visible in the plan, nothing else shuffles.

A killed run resumes exactly: every table commit is manifest-gated and
keyed by epoch, so re-running epoch K is idempotent (the catalog skips
already-committed epochs) and epoch K+1 rebuilds its frontier from the
committed epoch-K outlinks table.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import urltools as U
from ..operators import dedup as D
from ..operators import politeness as P
from ..operators import robots as RB
from ..sources.catalog import EpochCatalog
from . import extract as X

EPOCH_CLOCK0 = datetime(2025, 7, 22, 9, 0, 0, tzinfo=timezone.utc)


class CrawlEngine:
    """Driver-side orchestration; all data paths stay distributed."""

    def __init__(
        self,
        spark: SparkSession,
        catalog_root: str,
        pages: DataFrame,
        delay_seconds: float = 2.0,
        n_salts: int = 16,
        max_depth: int = 2,
        use_bloom: bool | str = "auto",
        seen_filter: str = "bloom",
        robots_pages: DataFrame | None = None,
        agent: str = "sparkcrawl",
        max_per_host_per_epoch: int | None = None,
        epoch_fetch_capacity: int | None = None,
        target_rows_per_task: int = 500,
        compact_every: int | None = None,
    ):
        self.spark = spark
        self.catalog = EpochCatalog(catalog_root)
        self.delay_seconds = delay_seconds
        self.n_salts = n_salts
        self.max_depth = max_depth
        self.use_bloom = use_bloom
        # seen-set pre-filter family (north rule: "bloom/cuckoo-filter
        # URL-seen set"): "bloom" (OR-mergeable bitmap, use_bloom gating
        # applies) or "cuckoo" (sharded partial-key tables — deletion-
        # capable, always on when selected). Either way the exact
        # anti-join on url_hash stays the source of truth.
        if seen_filter not in ("bloom", "cuckoo"):
            raise ValueError(f"seen_filter must be 'bloom' or 'cuckoo', got {seen_filter!r}")
        self.seen_filter = seen_filter
        self.agent = agent
        # per-host crawl budget: a hot host's frontier slice beyond this is
        # DEFERRED to the next epoch, not dropped. This is what bounds the
        # one deliberately-skewed partition (per-host ordering) at 10^10
        # scale — politeness alone already caps useful fetches per epoch
        # (epoch_window / delay), so scheduling more is wasted state.
        self.max_per_host_per_epoch = max_per_host_per_epoch
        # GLOBAL epoch capacity: when set, per-host budgets come from the
        # max-min fair water-fill (operators/aggregate.py) over this
        # epoch's actual frontier demands — small hosts fully served, the
        # remainder split evenly over the big ones; total fetches ≤
        # capacity exactly. Composes with max_per_host_per_epoch (the
        # effective budget is the lesser).
        self.epoch_fetch_capacity = epoch_fetch_capacity
        # sizing target for the url_hash rebalance (see _rebalance_width)
        self.target_rows_per_task = target_rows_per_task
        # auto-maintenance: compact+vacuum every N committed epochs (the
        # long-crawl small-file control; None = manual / CLI --compact)
        self.compact_every = compact_every
        if robots_pages is not None:
            # rules + per-host crawl delays: tiny tables, parsed once,
            # broadcast into every epoch (a real deployment refreshes them
            # on a TTL — the `robots` table of SURVEY §1.3)
            self.robots_rules = RB.parse_robots(robots_pages).localCheckpoint()
            self.delays = RB.crawl_delays(
                self.robots_rules, agent, delay_seconds
            ).localCheckpoint()
        else:
            self.robots_rules = None
            self.delays = None
        # corpus keyed by canonical URL (what the frontier joins against);
        # localCheckpoint = "the keyed corpus table already exists" — on a
        # real deployment this is the Iceberg pages table bucketed by
        # url_hash, written once, not recomputed per epoch
        self.pages = (
            U.with_url_columns(pages)
            .select("canonical_url", "url_hash", "warc_ts", "html", "text", "lang")
            .dropDuplicates(["url_hash"])
            .localCheckpoint()
        )

    # ------------------------------------------------------------------
    def _seen_rows_from_lineage(self) -> int:
        """Seen-set cardinality from the commit lineage in the manifest —
        no Spark job."""
        lineage = self.catalog.manifest("seen").get("lineage", {})
        return sum(e.get("fetched", 0) for e in lineage.values())

    def _rebalance_width(self) -> int:
        """Partition width for the url_hash rebalance, sized from the
        PREVIOUS epoch's fetched count in the manifest lineage (no Spark
        job): ~target_rows_per_task rows per task, clamped to [par, 4·par].

        The fixed 4·par width is right at cluster scale (short Arrow tasks
        absorb stragglers) but at small epoch sizes it splinters the work
        into tasks of a few hundred rows where per-task scheduling
        dominates the wall clock. Cold start (epoch 0, no lineage) keeps
        the conservative 4·par.
        """
        par = self.spark.sparkContext.defaultParallelism
        lineage = self.catalog.manifest("fetched").get("lineage", {})
        if not lineage:
            return par * 4
        last_epoch = max(int(k) for k in lineage)
        last_rows = lineage[str(last_epoch)].get("fetched", 0)
        if not last_rows:
            return par * 4
        return max(par, min(par * 4, -(-last_rows // self.target_rows_per_task)))

    def _bloom_decision(self) -> bool:
        """use_bloom="auto": the bloom pre-filter costs a build pass +
        broadcast per epoch, which only pays once `seen` is big enough that
        skipping the anti-join shuffle for ~99% of rows beats that cost."""
        if self.use_bloom != "auto":
            return bool(self.use_bloom)
        return self._seen_rows_from_lineage() >= 500_000

    # ------------------------------------------------------------------
    def _epoch_start(self, epoch: int):
        return F.lit(EPOCH_CLOCK0).cast("timestamp") + F.expr(
            f"INTERVAL {epoch * 3600} SECONDS"
        )

    def _frontier_for(self, seeds: DataFrame, epoch: int) -> DataFrame:
        """Seeds tagged for this epoch ∪ outlinks discovered in epoch-1."""
        f = seeds.filter(F.col("epoch") == epoch).select(
            "url", "source", "priority", "host", "canonical_url", "url_hash",
            F.lit(0).alias("depth"),
        )
        deferred = self.catalog.read(self.spark, "deferred", upto_epoch=epoch - 1)
        if deferred is not None:
            carried = deferred.filter(F.col("epoch") == epoch - 1).select(
                "url", F.lit("deferred").alias("source"), "priority", "host",
                "canonical_url", "url_hash", "depth",
            )
            f = f.unionByName(carried)
        prev = self.catalog.read(self.spark, "outlinks", upto_epoch=epoch - 1)
        if prev is not None and self.max_depth > 0:
            expanded = (
                prev.filter((F.col("epoch") == epoch - 1) & (F.col("depth") < self.max_depth))
                .select(
                    F.col("resolved_url").alias("url"),
                    F.lit("outlink").alias("source"),
                    # BFS-with-priority: discovered URLs rank after every
                    # seed (base 10^6), and within the discovered class
                    # shallower rings rank first — a deferred depth-2 link
                    # can never outrank a fresh depth-1 link
                    (F.lit(1_000_000) + F.col("depth") + 1).cast("int").alias("priority"),
                    (F.col("depth") + 1).alias("depth"),
                )
            )
            expanded = U.with_url_columns(expanded).select(
                "url", "source", "priority", "host", "canonical_url", "url_hash", "depth"
            )
            f = f.unionByName(expanded)
        # within-wave dedup: first (priority, url) wins per canonical URL
        return D.keep_latest(
            f.withColumn("__neg_pri", -F.col("priority")),
            keys=["url_hash"],
            ts_col="__neg_pri",
            tiebreakers=["url"],
        ).drop("__neg_pri")

    # ------------------------------------------------------------------
    def run_epoch(self, seeds: DataFrame, epoch: int) -> dict:
        """Run one epoch; returns counters. Idempotent per epoch.

        The skip guard checks ``seen`` — the LAST table committed — not
        ``fetched``: a crash between the fetched and seen commits must
        re-run the epoch (each per-table commit is itself idempotent, so
        already-committed tables are kept and only the missing ones are
        written)."""
        if epoch in self.catalog.committed_epochs("seen"):
            return {"epoch": epoch, "skipped": True}

        import os as _os
        import sys as _sys
        import time as _time
        _trace = _os.environ.get("SPARK_CRAWL_TRACE") == "1"
        _tmark = [_time.time()]

        def _phase(label):
            if _trace:
                now = _time.time()
                print(f"[epoch {epoch}] {label}: {now - _tmark[0]:.1f}s",
                      file=_sys.stderr)
                _tmark[0] = now

        frontier = self._frontier_for(seeds, epoch)

        # dedup vs seen  [shuffle: url_hash]
        seen = self.catalog.read(self.spark, "seen", upto_epoch=epoch - 1)
        if seen is not None:
            # expected_keys from the manifest lineage: the bloom bitmap is
            # sized to the seen-set without a count() job (dedup.py::
            # bloom_size_bits — no more fixed-capacity saturation)
            if self.seen_filter == "cuckoo":
                from ..operators import cuckoo as CK

                # url_hash IS the engine's URL identity (xxhash64 of the
                # canonical), so the filter keys on it directly and the
                # exact anti-join on the same column stays the truth
                frontier = CK.anti_join_seen_cuckoo(
                    frontier, seen.select("url_hash"),
                    key="url_hash", hash_key="url_hash",
                    expected_keys=self._seen_rows_from_lineage() or None,
                )
            else:
                frontier = D.anti_join_seen(
                    frontier, seen,
                    use_bloom=self._bloom_decision(),
                    expected_keys=self._seen_rows_from_lineage(),
                )

        # robots gate (north_rule): denied URLs are still committed to
        # `seen` via a fetched row with status=robots_denied — admitted
        # exactly once, never fetched
        denied = None
        if self.robots_rules is not None:
            allowed = RB.apply_robots(frontier, self.robots_rules, self.agent)
            denied = frontier.join(
                allowed.select("url_hash"), "url_hash", "left_anti"
            )
            frontier = allowed

        # schedule  [shuffle: salted host]
        frontier = frontier.withColumn(
            "salt", U.host_salt(F.col("host"), F.lit(epoch), self.n_salts)
        ).repartition(F.col("host"), F.col("salt"))
        if self.delays is not None:
            scheduled = RB.politeness_schedule_with_delays(
                frontier, self._epoch_start(epoch), self.delays, self.delay_seconds
            )
        else:
            scheduled = P.politeness_schedule(
                frontier, self._epoch_start(epoch), self.delay_seconds
            )

        # per-host epoch budget: overflow (seq > budget) is deferred to the
        # next epoch's frontier with its priority intact — bounded state
        # per host per epoch, nothing lost
        deferred_out = None
        if self.epoch_fetch_capacity is not None:
            from ..operators.aggregate import host_budget_waterfill

            demands = scheduled.groupBy("host").agg(
                F.count(F.lit(1)).alias("demand")
            )
            budgets = host_budget_waterfill(
                demands, self.epoch_fetch_capacity
            ).select("host", "budget")
            if self.max_per_host_per_epoch is not None:
                budgets = budgets.select(
                    "host",
                    F.least(
                        F.col("budget"),
                        F.lit(int(self.max_per_host_per_epoch)).cast("bigint"),
                    ).alias("budget"),
                )
            # per-host table: slim; AQE broadcasts the small side itself
            scheduled = scheduled.join(budgets, "host", "left")
            deferred_out = scheduled.filter(
                F.col("seq") > F.coalesce(F.col("budget"), F.lit(0))
            ).select(
                "url", "priority", "host", "canonical_url", "url_hash", "depth"
            )
            scheduled = scheduled.filter(
                F.col("seq") <= F.coalesce(F.col("budget"), F.lit(0))
            ).drop("budget")
        elif self.max_per_host_per_epoch is not None:
            budget = self.max_per_host_per_epoch
            deferred_out = scheduled.filter(F.col("seq") > budget).select(
                "url", "priority", "host", "canonical_url", "url_hash", "depth"
            )
            scheduled = scheduled.filter(F.col("seq") <= budget)

        # rebalance BEFORE the fetch join: politeness legitimately skews
        # partitioning by (host, salt) — a hot host is one partition — but
        # nothing downstream needs host-locality. Explicit repartition on
        # url_hash (fixed N, so AQE can't coalesce it away) spreads the
        # fetch join, extraction, and every commit across all cores. The
        # rows are still slim here (no html) so this shuffle is cheap; at
        # 100 TB it is the same url_hash bucketing the corpus join needs.
        # Width is lineage-informed (_rebalance_width): ~target rows/task,
        # capped at 4× parallelism — overpartitioning keeps each python
        # extraction task short at scale, while small epochs stop paying
        # per-task scheduling for few-hundred-row tasks
        scheduled = scheduled.repartition(self._rebalance_width(), F.col("url_hash"))

        # fetch = join against the offline corpus (broadcast-averse: both big)
        fetched = scheduled.join(
            self.pages.withColumnRenamed("url_hash", "p_hash"),
            scheduled["canonical_url"] == self.pages["canonical_url"],
            "left",
        ).select(
            scheduled["url"], scheduled["canonical_url"], scheduled["url_hash"],
            scheduled["host"], scheduled["priority"], scheduled["depth"],
            scheduled["seq"], scheduled["scheduled_ts"].alias("fetch_ts"),
            self.pages["html"], self.pages["text"], self.pages["lang"],
            F.when(self.pages["html"].isNotNull(), "ok").otherwise("error").alias("status"),
            F.lit(epoch).alias("epoch"),
        )
        if denied is not None:
            fetched = fetched.unionByName(
                denied.select(
                    "url", "canonical_url", "url_hash", "host", "priority", "depth",
                    F.lit(None).cast("int").alias("seq"),
                    F.lit(None).cast("timestamp").alias("fetch_ts"),
                    F.lit(None).cast("binary").alias("html"),
                    F.lit(None).cast("string").alias("text"),
                    F.lit(None).cast("string").alias("lang"),
                    F.lit("robots_denied").alias("status"),
                    F.lit(epoch).alias("epoch"),
                )
            )
        fetched = fetched.localCheckpoint()  # cut lineage; reused 4× below
        _phase("materialize fetched")

        ok = fetched.filter(F.col("status") == "ok")

        # extract + expand: ONE python parse per page yields both table
        # rows and outlinks (combined_extract_stage); materialized before
        # the split so neither branch re-runs the Arrow stage. The
        # materialized rows are slim (no html).
        combined = X.combined_extract_stage(
            ok.select(F.col("canonical_url").alias("url"), "html")
        ).localCheckpoint()
        _phase("extract (one-pass)")

        links = combined.filter(F.col("link").isNotNull()).select("url", "link")
        outlinks = X.resolve_links(links).select(
            F.col("url").alias("from_url"), "resolved_url",
            F.lit(epoch).alias("epoch"),
        )
        outlinks = outlinks.join(
            fetched.select(F.col("canonical_url").alias("from_url"), "depth"),
            "from_url",
        ).select("from_url", "resolved_url", "depth", "epoch")

        extracted = combined.filter(F.col("name").isNotNull()).select(
            "url", "name", "price", "change"
        ).withColumn("epoch", F.lit(epoch))

        # commit epoch snapshots (order matters: data first, seen last so a
        # crash can never mark a URL seen without its fetched row committed).
        # The four data commits touch independent table dirs/manifests and
        # all derive from the checkpointed `fetched` — submit them as
        # concurrent Spark jobs; only `seen` waits behind the barrier.
        import os as _os
        from concurrent.futures import ThreadPoolExecutor

        def _counts():
            return fetched.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("ok"),
            ).collect()[0]

        commit_lanes = int(_os.environ.get("SPARK_CRAWL_COMMIT_LANES", "6"))
        with ThreadPoolExecutor(max_workers=commit_lanes) as ex:
            futures = [
                ex.submit(self.catalog.commit_epoch, "fetched", epoch, fetched.drop("html")),
                ex.submit(self.catalog.commit_epoch, "extracted", epoch, extracted),
                ex.submit(self.catalog.commit_epoch, "outlinks", epoch, outlinks.drop("epoch")),
                ex.submit(self.catalog.commit_epoch, "metrics", epoch, P.epoch_metrics(fetched)),
            ]
            if deferred_out is not None:
                futures.append(
                    ex.submit(self.catalog.commit_epoch, "deferred", epoch, deferred_out)
                )
            counts_future = ex.submit(_counts)
            for fut in futures:
                fut.result()  # barrier: all data tables committed before seen
            counts = counts_future.result()
        _phase("data commits")
        n_fetched, n_ok = counts["n"], int(counts["ok"] or 0)
        self.catalog.commit_epoch(
            "seen", epoch,
            fetched.select("url_hash", "canonical_url").withColumn(
                "first_seen_epoch", F.lit(epoch)
            ),
            lineage={"fetched": n_fetched, "ok": n_ok},
        )
        _phase("seen commit")
        return {"epoch": epoch, "fetched": n_fetched, "ok": n_ok}

    def run(self, seeds: DataFrame, n_epochs: int = 3) -> list[dict]:
        start = self.catalog.last_epoch("seen")
        first = 0 if start is None else start + 1
        results = []
        for epoch in range(0, n_epochs):
            if epoch < first:
                results.append({"epoch": epoch, "skipped": True})
                continue
            results.append(self.run_epoch(seeds, epoch))
            if self.compact_every and (epoch + 1) % self.compact_every == 0:
                for table in ("fetched", "extracted", "outlinks",
                              "metrics", "seen", "deferred"):
                    if self.catalog.committed_epochs(table):
                        self.catalog.compact(self.spark, table)
                        self.catalog.vacuum(table)
        return results


def frontier_select(
    frontier: DataFrame,
    n: int,
    priority_col: str = "priority",
    url_col: str = "url",
) -> DataFrame:
    """Exact top-``n`` frontier selection WITHOUT a global sort — the
    epoch-budget pick from a 10^10-row priority frontier.

    Semantics (deterministic): the n rows ranking first by
    (priority DESC, md5(url) ASC, url ASC) — md5 gives a stable, engine-
    portable shuffle within a priority level so one hot level doesn't
    admit URLs in storage order.

    Plan: (1) one combiner-friendly ``groupBy(priority).count()`` —
    priority levels are few (ring depths, OPIC buckets), so the
    histogram is tiny; (2) the driver walks it descending to find the
    boundary level T and the remainder r; (3) levels above T pass by
    FILTER (no sort anywhere); (4) only the boundary level — one level's
    rows, not the frontier — goes through TakeOrderedAndProject for its
    r tie-broken seats. A naive orderBy().limit() ranks all 10^10 rows;
    this ranks one level.
    """
    pri = F.col(priority_col)
    hist = sorted(
        frontier.groupBy(pri.alias("__p")).count().collect(),
        key=lambda r: r["__p"], reverse=True,
    )
    total = 0
    boundary, remainder = None, 0
    for row in hist:
        if total + row["count"] >= n:
            boundary, remainder = row["__p"], n - total
            break
        total += row["count"]
    if boundary is None:
        return frontier  # fewer than n rows: everything is selected
    above = frontier.filter(pri > boundary)
    tie = frontier.filter(pri == boundary).orderBy(
        F.md5(F.col(url_col)), F.col(url_col)
    ).limit(remainder)
    return above.unionByName(tie)
