"""Corpus-quality operators for training-data pipelines (engine additions;
the reference has no corpus analytics — these extend SURVEY §2's scope the
way the build brief directs, alongside dedup.py/similarity.py).

All three are standard public-literature signals:

* ``gopher_quality`` — Rae et al. 2021 document filters (word count, mean
  word length, alpha-word ratio) as one shuffle-free projection.
* ``top_unigram_stats`` — repetition signal: the most frequent token's
  share of the document (Gopher's repetition family, unigram case).
* ``chunk_dedup_stats`` — exact duplicated-chunk accounting at k-word
  granularity (Lee et al. 2022 "Deduplicating Training Data", chunk
  variant): which documents carry text already seen elsewhere.

Scale notes: gopher_quality is pure projection (annotates the scan).
top_unigram_stats shuffles (id, word) pairs once into a per-doc agg —
combiner-friendly, skew-free (keys are (doc, word), not global words).
chunk_dedup_stats shuffles md5 fingerprints (16 B/chunk), never chunk
text, and the survivor window partitions by fingerprint — the same
hash-partition discipline as exact_dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T


def gopher_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_words, sum_word_len, n_alpha_words, flag_*) — integer-exact
    quality flags; see functions/text.py::gopher_quality_flags."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        *T.gopher_quality_flags(F.col(text_col)),
    )


def top_unigram_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    repetitive_pct: int = 10,
) -> DataFrame:
    """(doc_id, top_word, top_count, n_words, flag_repetitive): the modal
    token and its count per document; flag_repetitive when the top token
    is ≥ repetitive_pct% of all tokens (integer compare — no floats).
    Ties break lexicographically (deterministic)."""
    words = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(T.tokens(F.col(text_col))).alias("word"),
    )
    counts = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("word"))
    totals = Window.partitionBy("doc_id")
    return (
        counts.withColumn("n_words", F.sum("cnt").over(totals))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "doc_id",
            F.col("word").alias("top_word"),
            F.col("cnt").alias("top_count"),
            "n_words",
            (F.col("cnt") * 100 >= F.lit(repetitive_pct) * F.col("n_words")).alias(
                "flag_repetitive"
            ),
        )
    )


def chunk_dedup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 20,
) -> DataFrame:
    """(doc_id, n_chunks, n_dup_chunks): how many of the document's k-word
    chunks duplicate a chunk that appears earlier in (doc_id, chunk_idx)
    order anywhere in the corpus. ``n_dup_chunks = 0`` means fully novel
    text; ``n_dup_chunks = n_chunks`` means the whole document is recycled.
    The shuffle carries md5 fingerprints only."""
    chunks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(T.word_chunks(F.col(text_col), chunk_words)).alias(
            "chunk_idx", "chunk"
        ),
    ).select("doc_id", "chunk_idx", F.md5(F.col("chunk")).alias("fp"))
    w = Window.partitionBy("fp").orderBy("doc_id", "chunk_idx")
    flagged = chunks.withColumn("__rn", F.row_number().over(w))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("__rn") > 1).cast("bigint")).alias("n_dup_chunks"),
        )
    )
