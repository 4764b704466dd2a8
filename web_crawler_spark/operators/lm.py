"""Distributed n-gram language-model training + per-document perplexity
scoring — the CCNet-style corpus quality signal (Wenzek et al. 2020 score
documents with a KenLM 5-gram; the add-alpha bigram here is the same
pipeline shape with a declared simpler estimator, like ``token_count``'s
BPE-ish proxy).

Everything is DataFrame algebra:

- **train**: one (w1, w2) hash aggregation for bigram counts, one (w1)
  aggregation for context totals, one distinct count for the vocabulary
  size — three shuffles total over the exploded token stream, each with
  map-side partial aggregation (hot words combine per partition, so a
  stop-word context is one row per partition in the shuffle, not one per
  occurrence).
- **score**: explode each document's consecutive-token pairs, left-join
  the bigram and context count tables (unseen pairs smooth to
  ``alpha / (alpha * V)``), fold per-bigram log-probs per document.

Cross-engine determinism: per-bigram log-probs are **fixed-point int64**
(``floor(ln(p) * 1e6)``) before the per-document sum, so the aggregation
is integer arithmetic — order-independent and bit-identical between Spark
and the DuckDB oracle (a float sum's result depends on partition order;
an int sum doesn't). ``floor`` rather than ``round`` because Spark rounds
the shortest-decimal repr while DuckDB rounds the raw double — floor
operates on the bits in both engines. The derived ``perplexity`` double is
``exp`` of an exactly-reproducible int ratio.

At 100 TB: the bigram table is vocabulary²-bounded (far below corpus
size); its join key (w1, w2) is exactly the exploded stream's natural
key, and skew (stop-word bigrams) is bounded because the count side is
one row per distinct pair. Context totals are vocabulary-sized and
usually broadcastable; pass ``broadcast_contexts=True`` when the model's
vocabulary fits an executor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

LP_SCALE = 1_000_000
_WORD_RE = "[a-z0-9]+"
BOS, EOS = "<s>", "</s>"


def lm_tokens(text: Column) -> Column:
    """Lowercased word tokens wrapped in sentence markers:
    ``['<s>', w1, ..., wn, '</s>']``. Empty/non-text docs score on the
    single (<s>, </s>) bigram instead of being dropped."""
    words = F.regexp_extract_all(
        F.lower(text.cast("string")), F.lit(_WORD_RE), 0
    )
    return F.concat(F.array(F.lit(BOS)), words, F.array(F.lit(EOS)))


def _bigrams(df: DataFrame, text_col: str, keep: list[str]) -> DataFrame:
    w = lm_tokens(F.col(text_col))
    pair = F.explode(
        F.arrays_zip(
            F.slice(w, 1, F.size(w) - 1).alias("w1"),
            F.slice(w, 2, F.size(w) - 1).alias("w2"),
        )
    )
    return df.select(*keep, pair.alias("_p")).select(
        *keep, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
    )


def train_bigram_lm(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """Count-based bigram model over a training corpus.

    Returns ``(bigrams, contexts, vocab_size)``: per-pair counts
    ``(w1, w2, c)``, per-context totals ``(w1, ctx_c)``, and the smoothing
    vocabulary ``V`` = distinct token types (markers included) + 1 for
    unseen mass. ``V`` is a driver scalar (one count job) — the model's
    only non-DataFrame piece, same discipline as the IVF centroid fetch.
    """
    bg = _bigrams(docs, text_col, [])
    bigrams = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    contexts = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("ctx_c"))
    vocab_size = (
        bg.select(F.explode(F.array("w1", "w2")).alias("t"))
        .select("t")
        .distinct()
        .count()
        + 1
    )
    return bigrams, contexts, vocab_size


def score_docs(
    docs: DataFrame,
    bigrams: DataFrame,
    contexts: DataFrame,
    vocab_size: int,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_contexts: bool = False,
) -> DataFrame:
    """Per-document log-probability and perplexity under the trained model.

    ``P(w2|w1) = (c + alpha) / (ctx_c + alpha * V)`` (add-alpha smoothing;
    both counts 0 for unseen context). Returns
    ``(id_col, n_bigrams, logprob_fp, avg_logprob, perplexity)`` where
    ``logprob_fp`` is the exact int64 sum of per-bigram
    ``floor(ln(P) * 1e6)``, ``avg_logprob = logprob_fp / (n * 1e6)`` and
    ``perplexity = exp(-avg_logprob)``.
    """
    bg = _bigrams(docs, text_col, [id_col])
    ctx = contexts
    if broadcast_contexts:
        ctx = F.broadcast(ctx)
    joined = bg.join(bigrams, ["w1", "w2"], "left").join(ctx, ["w1"], "left")
    p = (F.coalesce(F.col("c"), F.lit(0)) + F.lit(alpha)) / (
        F.coalesce(F.col("ctx_c"), F.lit(0)) + F.lit(alpha * vocab_size)
    )
    lp_fp = F.floor(F.log(p) * F.lit(LP_SCALE)).cast("long")
    out = (
        joined.select(F.col(id_col), lp_fp.alias("_lp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("_lp").alias("logprob_fp"),
        )
    )
    avg = F.col("logprob_fp") / (F.col("n_bigrams") * F.lit(LP_SCALE))
    return out.select(
        id_col,
        "n_bigrams",
        "logprob_fp",
        avg.alias("avg_logprob"),
        F.exp(-avg).alias("perplexity"),
    )


def perplexity_filter(
    scored: DataFrame, max_perplexity: float
) -> DataFrame:
    """The CCNet head/middle/tail-style quality gate reduced to a
    threshold: keep documents the model finds predictable. Pure filter —
    composes with the Gopher flags and dedup gates in corpus pipelines."""
    return scored.filter(F.col("perplexity") <= F.lit(max_perplexity))
