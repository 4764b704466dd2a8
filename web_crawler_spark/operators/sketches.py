"""Mergeable frequency sketches — Misra-Gries heavy hitters and the
Count-Min sketch (engine additions).

Public algorithm: Misra & Gries 1982 ("Finding repeated elements") with
the mergeable-summaries analysis of Agarwal et al. 2012: a capacity-``c``
summary over a stream of N items underestimates any item's count by at
most Δ ≤ N/(c+1), and summaries from disjoint streams merge by adding
counts (the merged error is the sum of the parts' Δs). This is THE
bounded-memory answer to "most frequent hosts / shingles / n-grams" when
key cardinality is too large for an exact groupBy at 100 TB: per-partition
state is capped at ``capacity`` entries no matter how skewed or wide the
key space is, and only (item, weight) pairs ≤ capacity·n_partitions cross
the wire.

Spark shape: one Arrow-batched ``mapInPandas`` pass builds a per-partition
summary (the sketch is inherently sequential state — the documented UDF
exception), then one tiny groupBy merges summaries. Contrast with the
exact path (full groupBy on the raw keys): the sketch's shuffle volume is
O(capacity · partitions), independent of N and of distinct-key count.

Guarantees surfaced to callers: each row carries ``est`` (lower bound,
est ≤ true) and the global ``max_err`` column (Σ per-partition Δ) so
``est + max_err`` upper-bounds the true count; any item with true count
> max_err is guaranteed present in the merged summary.

Exactness regime: when every partition sees ≤ capacity distinct items,
Δ = 0 everywhere and the sketch IS the exact count — the oracle query
certifies that regime value-for-value; the approximate regime is pinned
by property tests against exact counts (bound + retention).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

_SUMMARY_SCHEMA = StructType(
    [
        StructField("item", StringType()),
        StructField("est", LongType()),
        StructField("delta", LongType()),  # per-partition decrement total
    ]
)


def _mg_summarize(capacity: int):
    """Per-partition Misra-Gries with the standard subtract-the-min batch
    decrement (amortized O(1) per item via dict + periodic compaction)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        delta = 0
        for pdf in batches:
            for item in pdf["item"]:
                if item is None:
                    continue
                c = counters.get(item)
                if c is not None:
                    counters[item] = c + 1
                elif len(counters) < capacity:
                    counters[item] = 1
                else:
                    # decrement all by the min count, evict zeros, admit
                    # the new item with (1) — the classic batch step
                    m = min(counters.values())
                    counters = {k: v - m for k, v in counters.items() if v > m}
                    delta += m
                    # the incoming item absorbs one decrement too: its
                    # residual is 1 only if m == 1 semantics — classic MG
                    # admits it when a slot freed; min-batch always frees
                    counters[item] = 1
        if counters or delta:
            yield pd.DataFrame(
                {
                    "item": list(counters.keys()) + [None],
                    "est": [int(v) for v in counters.values()] + [0],
                    "delta": [0] * len(counters) + [int(delta)],
                }
            )

    return gen


def mg_heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 20,
    capacity: int = 4096,
) -> DataFrame:
    """Top-k heavy hitters of ``col`` with bounded memory.

    Returns (item, est, max_err): ``est`` ≤ true count ≤ ``est + max_err``;
    ordered by est desc, item asc (deterministic), limited to k. Any item
    whose true count exceeds ``max_err`` is guaranteed to appear in the
    merged summary (it may rank below k if est falls short).
    """
    items = df.select(F.col(col).cast("string").alias("item"))
    summaries = items.mapInPandas(_mg_summarize(capacity), _SUMMARY_SCHEMA)
    # Δ rows ride the same tiny frame (item NULL); split with an agg each.
    merged = (
        summaries.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("est").alias("est"))
    )
    err = summaries.agg(F.sum("delta").alias("max_err"))
    return (
        merged.crossJoin(F.broadcast(err))
        .orderBy(F.desc("est"), F.asc("item"))
        .limit(int(k))
        .select("item", "est", F.coalesce("max_err", F.lit(0)).alias("max_err"))
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved data stream
# summary: the count-min sketch and its applications")
# ---------------------------------------------------------------------------

def _cms_col(col, row: int, width: int):
    """Row-``row`` CMS column index for ``col``: the first 8 hex chars of a
    salted md5 as an unsigned 32-bit value mod ``width``. md5 is portable —
    the DuckDB oracle recomputes the identical cell addresses."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"cms:{row}:"), col)), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_sketch(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build a ``depth × width`` Count-Min sketch of ``col``.

    Returns the sketch as its non-zero cells ``(row, col, cnt)`` — at most
    depth·width rows no matter how many items or distinct keys went in.
    Point estimates OVERcount (est ≥ true; est ≤ true + εN with
    ε = e/width at probability 1 − e^−depth), the mirror guarantee of the
    Misra-Gries summary above (which UNDERcounts) — together they bracket.

    Spark shape: each item explodes into ``depth`` (row, col) cell hits,
    then ONE groupBy(row, col) count. Partial aggregation caps what any
    task emits into the exchange at depth·width rows, so shuffle volume is
    O(depth · width · partitions) — independent of N and of key
    cardinality, which is the reason to sketch instead of groupBy(key) at
    100 TB. Sketches over disjoint slices merge by cell-wise sum
    (:func:`cms_merge`) with NO re-scan of the data.
    """
    item = F.col(col).cast("string")
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    _cms_col(item, i, width).alias("col"),
                )
                for i in range(depth)
            ]
        )
    )
    return (
        df.filter(item.isNotNull())
        .select(cells.alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge same-shape CMS sketches by cell-wise sum (exact: the merged
    sketch is identical to sketching the concatenated streams)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    col: str = "item",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query ``queries[col]`` against a sketch built with the same
    (depth, width): est = min over rows of the addressed cell.

    The sketch side is ≤ depth·width rows → broadcast; the probe side
    explodes each query into its ``depth`` cell addresses and never
    shuffles. Cells a query item never touched are absent from the sketch
    (zero) — the left join coalesces them to 0, so unseen items estimate 0
    exactly as the dense-array formulation would.
    """
    item = F.col(col).cast("string")
    probes = queries.select(
        item.alias("item"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cms_col(item, i, width).alias("col"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    ).select("item", F.col("c.row").alias("row"), F.col("c.col").alias("col"))
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
