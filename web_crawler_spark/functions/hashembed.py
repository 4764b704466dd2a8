"""Feature-hashing TF-IDF document embeddings (engine addition).

The hashing trick (Weinberger et al. 2009, "Feature Hashing for Large
Scale Multitask Learning" — the scheme behind scikit-learn's
``HashingVectorizer`` and Vowpal Wabbit): each word hashes to one of
``dim`` buckets with a ±1 sign drawn from a second hash (the sign keeps
collisions unbiased), components are tf·idf, and the vector is
L2-normalized. This bridges the text tables to the engine's vector stack
— hashed embeddings feed :mod:`operators/similarity` (LSH/IVF/PQ/SemDeDup)
directly, giving text near-dup and retrieval WITHOUT any model weights or
external embedding service.

Determinism / oracle portability:
* buckets and signs come from md5 (the repo-wide portable-hash
  discipline) — never an engine-native hash;
* idf is fixed-point — ``floor(ln((N+1)/(df_b+1)) · 1e4)`` as int — so
  each raw component ``tf·idf_fp`` is an exact int64 and the squared-norm
  is an ORDER-INDEPENDENT integer sum (float additions would make the
  norm depend on aggregation order and break cross-engine equality);
* the only float ops are one division and one sqrt per component — both
  IEEE exactly-rounded, hence bit-identical on any engine.

Scale notes (100 TB): tokenize+hash is a projection; the component agg is
(doc, bucket)-keyed (combiner-friendly, ≤ dim keys per doc, no global hot
key); idf is a ``dim``-row broadcast; densify is one per-doc map agg. No
shuffle carries text past the first agg — just (doc_id, bucket, int)
triples.

int64 range: |component| ≤ tf·idf_fp ≤ tf · ln(N)·1e4; the squared-norm
integer sum stays in int64 for tf up to ~10^5 per bucket at N=10^12 —
far beyond any real document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

IDF_FP = 10_000  # fixed-point scale for idf (bounded so Σ comp² fits int64)
WORD_RE = "[a-z0-9]+"


def _words(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit(WORD_RE), 0)


def _bucket(word: Column, dim: int, salt: str) -> Column:
    h = F.md5(F.concat(F.lit(f"{salt}:"), word))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % dim


def _sign(word: Column, salt: str) -> Column:
    h = F.md5(F.concat(F.lit(f"{salt}-sign:"), word))
    bit = F.conv(F.substring(h, 1, 1), 16, 10).cast("int") % 2
    return F.when(bit == 0, F.lit(1)).otherwise(F.lit(-1))


def hash_embed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    salt: str = "hembed",
) -> DataFrame:
    """(doc_id, embedding: array<double>) — L2-normalized signed-hash
    TF-IDF vectors. Documents with no words are omitted (their vector is
    undefined, not zero — mirroring dsir_weights' empty-doc contract).

    N for idf is the TOTAL input row count (including wordless docs) —
    one scalar fetch, folded as a literal (the bm25 idf-fold discipline).
    """
    n_docs = df.count()
    pairs = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_words(F.col(text_col))).alias("word"),
    )
    tf = pairs.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    hashed = tf.select(
        "doc_id",
        _bucket(F.col("word"), dim, salt).alias("bucket"),
        (_sign(F.col("word"), salt) * F.col("tf")).alias("stf"),
    )
    # materialized once: both the idf branch and the component branch read
    # this slim (doc, bucket, int) frame — without the checkpoint each
    # branch re-tokenizes and re-hashes the full text (measured 2x cost)
    hashed = hashed.localCheckpoint(eager=True)
    comps = hashed.groupBy("doc_id", "bucket").agg(
        F.sum("stf").cast("bigint").alias("s_tf")
    )
    # bucket document frequency: docs containing ANY word in the bucket
    dfreq = (
        hashed.select("doc_id", "bucket")
        .distinct()
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("df_b"))
        .select(
            "bucket",
            F.floor(
                F.log((F.lit(float(n_docs + 1))) / (F.col("df_b") + 1.0))
                * IDF_FP
            )
            .cast("bigint")
            .alias("idf_fp"),
        )
    )
    weighted = comps.join(F.broadcast(dfreq), "bucket").select(
        "doc_id", "bucket", (F.col("s_tf") * F.col("idf_fp")).alias("comp")
    )
    # one agg carries BOTH the sparse entries and the integer squared norm
    # (zeros contribute nothing to Σ comp², so sparse == dense — and the
    # integer sum is aggregation-order-independent, hence engine-exact)
    dense = weighted.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "comp"))).alias("m"),
        F.sum(F.col("comp") * F.col("comp")).alias("sumsq"),
    )
    # densify + normalize in a single pass over the index sequence — much
    # cheaper than dim separate element_at projections + an array re-fold
    norm = F.sqrt(F.col("sumsq").cast("double"))
    return dense.filter(F.col("sumsq") > 0).select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("m"), i.cast("int")), F.lit(0).cast("bigint")
            ).cast("double")
            / norm,
        ).alias("embedding"),
    )


def duckdb_hash_embed_sql(
    dim: int = 64, salt: str = "hembed", table: str = "documents"
) -> str:
    """DuckDB CTE block mirroring :func:`hash_embed` bit-for-bit; exposes
    ``hembed(doc_id, embedding)`` with the dense normalized array ordered
    by bucket index. Compose with ``WITH {this}, ... SELECT``."""
    return f"""
hw AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
  FROM {table}
), htf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM hw GROUP BY 1, 2
), hh AS (
  SELECT doc_id,
         TRY_CAST(concat('0x', substr(md5(concat('{salt}:', word)), 1, 4))
                  AS INT) % {dim} AS bucket,
         (CASE WHEN TRY_CAST(concat('0x',
                 substr(md5(concat('{salt}-sign:', word)), 1, 1)) AS INT) % 2 = 0
               THEN 1 ELSE -1 END) * tf AS stf
  FROM htf
), hcomps AS (
  SELECT doc_id, bucket, CAST(sum(stf) AS BIGINT) AS s_tf
  FROM hh GROUP BY 1, 2
), hdf AS (
  SELECT bucket,
         CAST(floor(ln(((SELECT COUNT(*) FROM {table}) + 1.0)
                       / (COUNT(DISTINCT doc_id) + 1.0)) * {IDF_FP})
              AS BIGINT) AS idf_fp
  FROM hh GROUP BY bucket
), hweighted AS (
  SELECT doc_id, bucket, s_tf * idf_fp AS comp
  FROM hcomps JOIN hdf USING (bucket)
), hdense AS (
  SELECT d.doc_id, i.i, COALESCE(w.comp, 0) AS comp
  FROM (SELECT DISTINCT doc_id FROM hweighted) d
  CROSS JOIN (SELECT unnest(generate_series(0, {dim - 1})) AS i) i
  LEFT JOIN hweighted w ON w.doc_id = d.doc_id AND w.bucket = i.i
), hnorm AS (
  SELECT doc_id, CAST(sum(comp * comp) AS BIGINT) AS sumsq
  FROM hdense GROUP BY 1
), hembed AS (
  SELECT h.doc_id,
         list(CAST(h.comp AS DOUBLE) / sqrt(CAST(n.sumsq AS DOUBLE))
              ORDER BY h.i) AS embedding
  FROM hdense h JOIN hnorm n USING (doc_id)
  WHERE n.sumsq > 0
  GROUP BY h.doc_id
)
"""
