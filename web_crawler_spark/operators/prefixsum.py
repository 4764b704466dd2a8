"""Distributed exact prefix sum — the two-level scan pattern.

A running total over a global order is the primitive behind byte-balanced
shard packing, exact token-budget cuts, and offset assignment. The naive
Spark form — ``sum().over(Window.orderBy(key))`` with no partitionBy — is
an unpartitioned window: every row flows through ONE task, which is the
single worst plan shape at 100 TB. The classic fix (Blelloch scan, the
same shape every MPP engine uses) is two levels:

1. range-partition rows by the order key (disjoint, ordered key ranges
   per partition),
2. an honest per-partition window computes local running totals,
3. a tiny per-partition aggregate (one row per partition) is cum-summed
   on the driver-sized side and broadcast-joined back as offsets.

The result is EXACTLY the global prefix sum — partition boundaries are
internal, so the output is independent of how the range partitioner
split the data — while the only unpartitioned work is a window over
``n_partitions`` rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prefix_sum(
    df: DataFrame,
    order_cols: str | list[str],
    value_col: str | list[str],
    out_col: str | list[str] = "cum",
    n_partitions: int = 64,
    partition_cols: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Exact inclusive prefix sum of ``value_col`` (or several — pass
    parallel lists of value/out names; they share the one scan) over the
    total order given by ``order_cols`` — per group when
    ``partition_cols`` is set. ``(partition_cols, order_cols)`` must be
    unique per row: ties could split across range-partition boundaries
    and make the order ambiguous.

    Returns the input columns plus ``out_col``. Scale shape: one range
    exchange of the slim input on ``(partition_cols…, order_cols…)`` +
    one honest per-physical-partition window + a tiny aggregate (one row
    per (group, physical partition) pair) folded back as offsets — no
    row-level data ever crosses a single-partition exchange, and a group
    holding 90% of the corpus is spread over ~90% of the range
    partitions instead of serializing through one window task (the hot
    partition every ``Window.partitionBy(group)`` running total has).
    The offsets side is broadcast in the global case; with groups it
    stays a plain equi-join so 10^5+ group cardinality never inflates a
    broadcast.
    """
    if isinstance(order_cols, str):
        order_cols = [order_cols]
    vcols = [value_col] if isinstance(value_col, str) else list(value_col)
    outs = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(vcols) != len(outs):
        raise ValueError("value_col and out_col lists must align")
    ocols = list(order_cols)
    pcols = list(partition_cols)
    keys = pcols + ["__part"]
    ranged = df.repartitionByRange(
        n_partitions, *[F.col(c) for c in pcols + ocols]
    ).withColumn("__part", F.spark_partition_id())
    # localCheckpoint pins the partitioner's (deterministic-result,
    # boundary-arbitrary) split so the window and the offsets agg read
    # the SAME __part values rather than recomputing the lineage twice.
    ranged = ranged.localCheckpoint(eager=False)
    w_local = (
        Window.partitionBy(*keys)
        .orderBy(*ocols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged
    for i, v in enumerate(vcols):
        local = local.withColumn(f"__local_cum{i}", F.sum(v).over(w_local))
    totals = ranged.groupBy(*keys).agg(
        *[F.sum(v).alias(f"__part_sum{i}") for i, v in enumerate(vcols)],
        F.min(F.struct(*ocols)).alias("__part_min"),
    )
    w_parts = (
        Window.partitionBy(*pcols)
        .orderBy("__part_min")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        *keys,
        *[
            (F.sum(f"__part_sum{i}").over(w_parts) - F.col(f"__part_sum{i}"))
            .alias(f"__offset{i}")
            for i in range(len(vcols))
        ],
    )
    if not pcols:
        offsets = F.broadcast(offsets)
    out = local.join(offsets, keys)
    drop = ["__part"]
    for i, name in enumerate(outs):
        out = out.withColumn(name, F.col(f"__local_cum{i}") + F.col(f"__offset{i}"))
        drop += [f"__local_cum{i}", f"__offset{i}"]
    return out.drop(*drop)


def shard_pack(
    df: DataFrame,
    target_bytes: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_partitions: int = 64,
) -> DataFrame:
    """Byte-balanced output-shard assignment (the FineWeb/Dolma writer
    problem: emit shards of ~``target_bytes`` each, not
    one-file-per-partition roulette). Documents are laid end-to-end in
    ``id_col`` order; a document is assigned the shard its first byte
    lands in: ``shard_id = floor((cum_bytes - n_bytes) / target_bytes)``
    — greedy packing, deterministic, engine-portable (UTF-8 byte
    lengths). A writer repartitions by ``shard_id`` and each task emits
    exactly one ~target-sized file.

    Returns ``(doc_id, n_bytes, cum_bytes, shard_id)``. Built on
    :func:`prefix_sum`, so the global running total costs one range
    exchange of (id, bytes) pairs — document text never shuffles.
    """
    slim = df.select(
        F.col(id_col).alias("doc_id"),
        F.octet_length(F.col(text_col).cast("string")).cast("bigint").alias("n_bytes"),
    )
    cum = prefix_sum(slim, "doc_id", "n_bytes", out_col="cum_bytes",
                     n_partitions=n_partitions)
    return cum.select(
        "doc_id",
        "n_bytes",
        F.col("cum_bytes").cast("bigint").alias("cum_bytes"),
        F.floor((F.col("cum_bytes") - F.col("n_bytes")) / F.lit(int(target_bytes)))
        .cast("bigint")
        .alias("shard_id"),
    )
