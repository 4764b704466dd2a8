"""Crawl-history operators over versioned page tables — the time axis of a
Common-Crawl-style corpus ``(url, warc_ts, html, text, lang)`` (BASELINE
input_hint). A recrawled URL appears once per fetch; these answer the two
standard questions a corpus consumer asks of that history:

* ``snapshot_asof``    — "the corpus as of time T": latest version per URL
  with ``warc_ts <= T`` (what a training-data cut or a reproducible
  dataset release needs).
* ``change_detection`` — which recrawls actually changed: per-URL version
  chain with a content-fingerprint ``lag`` comparison, so downstream
  dedup/refresh scheduling can skip unchanged fetches.

Both are one hash-partition shuffle on the URL key (window functions);
fingerprints are md5 of normalized text (functions/text.py) so the change
bit never compares payload bytes across the shuffle. The reference crawler
is depth-1/snapshot-free — these generalize its keep-latest merge
(processor.py:335-380, the F8 family) along the time axis.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T
from .dedup import keep_latest


def snapshot_asof(
    df: DataFrame,
    asof,
    ts_col: str = "warc_ts",
    key_col: str = "url",
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Latest version per key with ``ts_col <= asof``. ``asof`` may be a
    literal string/timestamp or a Column."""
    cutoff = asof if isinstance(asof, Column) else F.lit(asof).cast("timestamp")
    return keep_latest(
        df.filter(F.col(ts_col) <= cutoff), [key_col], ts_col, tiebreakers
    )


def change_detection(
    df: DataFrame,
    ts_col: str = "warc_ts",
    key_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Per-URL version chain annotated with change bits:

    (key, ts, version_no, fingerprint, changed) where ``changed`` is true
    for the first version and for any version whose normalized-content
    fingerprint differs from its predecessor. ``filter(changed)`` is the
    deduplicated refresh stream; ``filter(~changed)`` counts wasted
    recrawls (refresh-scheduling signal).
    """
    out = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        T.content_fingerprint(F.col(text_col)).alias("fingerprint"),
    )
    w = Window.partitionBy("key").orderBy(F.col("ts").asc())
    return (
        out.withColumn("version_no", F.row_number().over(w))
        .withColumn("__prev", F.lag("fingerprint").over(w))
        .withColumn(
            "changed",
            F.col("__prev").isNull() | (F.col("fingerprint") != F.col("__prev")),
        )
        .drop("__prev")
    )
