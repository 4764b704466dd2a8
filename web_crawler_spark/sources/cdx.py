"""CDX(J) URL index — Common Crawl / Internet Archive interop.

The reference crawler keeps no URL index at all (its whole run is ~25
records, pacong/config/settings.yaml seeds); at Common-Crawl scale the
public convention for "where is every capture of every URL" is the CDXJ
index (cc-index / pywb): one text line per capture —

    <urlkey> <14-digit timestamp> {"url": ..., "mime": ..., "status": ...,
                                   "digest": ..., "length": ...}

— shards globally sorted by (urlkey, timestamp), plus a ``cluster.idx``
secondary index mapping each shard's FIRST key to its shard file, so a
prefix lookup (one URL, one host, one domain) opens only the shard(s)
whose key range can overlap. That two-level structure is the entire point
of the format: 10^10 captures are queryable without scanning the index.

Spark-first re-expression:

- :func:`cdx_records` — urlkey via :func:`~web_crawler_spark.functions.
  urltools.surt_key` (pure Column, whole-stage codegen), 14-digit
  timestamp via ``date_format``, JSON block via ``to_json``. No UDFs.
- :func:`write_cdx` — ``repartitionByRange(n_shards, urlkey, ts)`` →
  ``sortWithinPartitions`` → one text shard per range partition. Range
  partitioning (Spark samples the key distribution) gives the GLOBAL sort
  across shard files; each shard is internally sorted, so lookup is
  cluster.idx → shard → in-shard scan of a key-contiguous slice.
- ``cluster.idx`` holds one row per shard (first urlkey + filename) —
  driver-sized by construction (40k shards for a 100 TB crawl ≈ a few MB),
  the same way Common Crawl's cluster.idx is a single small file next to
  300 cdx-*.gz shards.
- :func:`cdx_lookup` prunes shard files through cluster.idx BEFORE Spark
  reads anything — the file list handed to ``spark.read`` already excludes
  every shard whose [first_key, next_first_key) range cannot contain the
  prefix. At 10^10 captures a single-host query reads one or two shards.

Deviation from the archival format, declared: ``digest`` is md5-hex (both
Spark and the DuckDB oracle compute it natively) rather than sha1-base32,
and shards are plain text rather than gzip members (``.gz`` per-member
framing is an HTTP-range-serving concern, not a query-engine one).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.urltools import surt_key

CDX_SCHEMA = T.StructType(
    [
        T.StructField("urlkey", T.StringType(), False),
        T.StructField("ts", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("length", T.LongType(), True),
    ]
)


def cdx_records(
    fetched: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
    mime: str = "text/html",
    status_col: str | None = None,
) -> DataFrame:
    """Capture rows → CDX index rows ``(urlkey, ts, url, mime, status,
    digest, length)``. Pure Column expressions end to end.

    ``urlkey`` is the SURT key of the capture URL, ``ts`` the 14-digit
    UTC timestamp, ``digest`` md5 of the payload bytes, ``length`` the
    payload octet length.
    """
    url = F.col(url_col).cast("string")
    body = F.col(payload_col).cast("string")
    status = (
        F.col(status_col).cast("int") if status_col else F.lit(200)
    )
    return fetched.select(
        surt_key(url).alias("urlkey"),
        F.date_format(F.col(ts_col), "yyyyMMddHHmmss").alias("ts"),
        url.alias("url"),
        F.lit(mime).alias("mime"),
        status.alias("status"),
        F.md5(body.cast("binary")).alias("digest"),
        F.octet_length(body).cast("long").alias("length"),
    )


def cdx_lines(records: DataFrame) -> DataFrame:
    """CDX rows → one CDXJ text line per capture (column ``value``)."""
    block = F.to_json(
        F.struct("url", "mime", "status", "digest", "length")
    )
    return records.select(
        F.concat_ws(" ", F.col("urlkey"), F.col("ts"), block).alias("value")
    )


def write_cdx(records: DataFrame, path: str, n_shards: int = 4) -> list[dict]:
    """Write a globally-sorted sharded CDXJ index + ``cluster.idx``.

    ``repartitionByRange`` samples (urlkey, ts) and assigns contiguous key
    ranges to partitions; ``sortWithinPartitions`` orders within each.
    Text part files inherit the partition index, so the shard files are in
    global key order. ``cluster.idx`` (first key of every shard → shard
    file) is one row per shard — collected to the driver by construction,
    exactly like Common Crawl's own cluster.idx.

    Returns the cluster.idx entries ``[{"urlkey", "ts", "file"}, ...]``.
    """
    shard_dir = os.path.join(path, "shards")
    out = records.repartitionByRange(
        n_shards, F.col("urlkey"), F.col("ts")
    ).sortWithinPartitions("urlkey", "ts")
    cdx_lines(out).write.mode("overwrite").text(shard_dir)

    spark = records.sparkSession
    # first line per shard file: min() is the first line because each shard
    # is sorted — one tiny agg over the just-written index, no driver scan
    firsts = (
        spark.read.text(shard_dir)
        .select(
            F.input_file_name().alias("file"),
            F.col("value").alias("line"),
        )
        .groupBy("file")
        .agg(F.min("line").alias("first_line"))
        .orderBy("file")
        .collect()
    )
    entries = []
    for r in firsts:
        urlkey, ts, _ = r["first_line"].split(" ", 2)
        fname = os.path.basename(r["file"])
        entries.append({"urlkey": urlkey, "ts": ts, "file": fname})
    with open(os.path.join(path, "cluster.idx"), "w", encoding="utf-8") as f:
        for e in entries:
            f.write(f"{e['urlkey']} {e['ts']}\t{e['file']}\n")
    return entries


def read_cluster_idx(path: str) -> list[dict]:
    entries = []
    with open(os.path.join(path, "cluster.idx"), encoding="utf-8") as f:
        for line in f:
            key_part, fname = line.rstrip("\n").split("\t")
            urlkey, ts = key_part.rsplit(" ", 1)
            entries.append({"urlkey": urlkey, "ts": ts, "file": fname})
    return entries


def _parse_lines(df: DataFrame) -> DataFrame:
    """CDXJ text lines → typed CDX rows (split + from_json, no UDF)."""
    urlkey = F.substring_index(F.col("value"), " ", 1)
    rest = F.expr("substring(value, length(substring_index(value, ' ', 1)) + 2)")
    ts = F.substring_index(rest, " ", 1)
    block = F.expr(
        "substring(value, length(substring_index(value, ' ', 2)) + 2)"
    )
    json_schema = T.StructType(
        [f for f in CDX_SCHEMA.fields if f.name not in ("urlkey", "ts")]
    )
    parsed = F.from_json(block, json_schema)
    return df.select(
        urlkey.alias("urlkey"),
        ts.alias("ts"),
        parsed["url"].alias("url"),
        parsed["mime"].alias("mime"),
        parsed["status"].alias("status"),
        parsed["digest"].alias("digest"),
        parsed["length"].alias("length"),
    )


def cdx_scan(spark: SparkSession, path: str) -> DataFrame:
    """Read the whole index back as typed rows."""
    return _parse_lines(spark.read.text(os.path.join(path, "shards")))


def cdx_lookup(spark: SparkSession, path: str, prefix: str) -> DataFrame:
    """Prefix lookup (exact URL / host / domain query) that reads ONLY the
    shards whose key range can contain ``prefix`` — shard pruning happens
    on the driver via cluster.idx before any Spark scan is planned.

    Shard i covers [first_i, first_{i+1}); it can contain keys starting
    with ``prefix`` iff first_i < prefix+SENTINEL and (i is last or
    first_{i+1} > prefix). Within the surviving shard(s) the startswith
    filter runs as a codegen substring compare.
    """
    entries = read_cluster_idx(path)
    hi = prefix + "￿"
    keep = []
    for i, e in enumerate(entries):
        nxt = entries[i + 1]["urlkey"] if i + 1 < len(entries) else None
        if e["urlkey"] <= hi and (nxt is None or nxt >= prefix):
            keep.append(os.path.join(path, "shards", e["file"]))
    if not keep:
        return spark.createDataFrame([], CDX_SCHEMA)
    return _parse_lines(spark.read.text(keep)).filter(
        F.col("urlkey").startswith(prefix)
    )


def cdx_shard_plan(
    index: DataFrame,
    n_shards: int = 8,
    key_col: str = "urlkey",
    ts_col: str = "ts",
) -> DataFrame:
    """CDX index shard-split plan — the publishing layout of a
    Common-Crawl-style capture index (the public cc-index is exactly
    this: SURT-ordered cdx-NNNNN.gz shards plus a cluster.idx of shard
    boundary keys): rank every record in (urlkey, ts) order, cut into
    ``n_shards`` equal-count contiguous ranges, and report each shard's
    row count and inclusive [start, end] boundary keys — what a lookup
    service loads to binary-search the right shard.

    (key, ts) must be unique per record (CDX semantics: one capture per
    (urlkey, timestamp); revisit records carry distinct ts) — the global
    rank rides :func:`~web_crawler_spark.operators.prefixsum.prefix_sum`'s
    range-exchange scan, so no single-partition window anywhere; shard
    assignment is exact integer algebra ⌊(rank−1)·S / n⌋ (balanced to
    ±1 row by construction). One scalar count fetch for n (the repo's
    documented pattern). Returns (shard_id, n_rows, start_urlkey,
    end_urlkey) ordered by shard.
    """
    from ..operators.prefixsum import prefix_sum

    n = index.count()
    if n == 0 or n_shards <= 0:
        return index.sparkSession.createDataFrame(
            [],
            "shard_id long, n_rows long, start_urlkey string, "
            "end_urlkey string",
        )
    s = int(n_shards)
    ranked = prefix_sum(
        index.select(key_col, ts_col).withColumn("__one", F.lit(1)),
        [key_col, ts_col],
        "__one",
        out_col="__rank",
    )
    shard = F.expr(f"((__rank - 1) * {s}) div {n}").cast("long")
    return (
        ranked.withColumn("shard_id", shard)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min(key_col).alias("start_urlkey"),
            F.max(key_col).alias("end_urlkey"),
        )
        .orderBy("shard_id")
    )
