"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``      exact brute-force scan — the correctness baseline.
  One projection + TakeOrderedAndProject; at 100 TB this is a full-corpus
  scan but embarrassingly parallel (no shuffle until the final top-k heap
  merge on the driver-side reduce).
- ``lsh_topk``         sign-random-projection buckets: probe only vectors in
  the query's bucket (+ optional multiprobe neighbors). Cuts the scan by
  ~2^n_planes at a small recall cost — the scale path.
- ``ivf_topk``         IVF-style coarse quantizer built from a sampled set of
  centroid rows: assign each vector to its nearest centroid once (a write-
  time transform at scale), probe the closest ``n_probe`` centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V


def _query_lit(query_vec: list[float]):
    return F.array(*[F.lit(float(x)) for x in query_vec])


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    q = _query_lit(query_vec)
    return (
        df.select(
            F.col(id_col),
            F.round(V.cosine(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    multiprobe: int = 1,
) -> DataFrame:
    """Probe the query's LSH bucket plus all buckets within ``multiprobe``
    bit flips (rank-1 multiprobe = n_planes+1 buckets)."""
    q = _query_lit(query_vec)
    bucketed = df.withColumn("bucket", V.lsh_bucket(F.col(vec_col), n_planes))
    qb = bucketed.sparkSession.range(1).select(
        V.lsh_bucket(q, n_planes).alias("qbucket")
    ).collect()[0]["qbucket"]
    probes = {qb} | ({qb ^ (1 << p) for p in range(n_planes)} if multiprobe else set())
    return (
        bucketed.filter(F.col("bucket").isin(*probes))
        .select(
            F.col(id_col),
            F.round(V.cosine(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF with deterministic sampled centroids (ids hashed by seed — a
    stand-in for k-means at small scale; at 100 TB the centroid set is
    trained offline and broadcast, exactly as here)."""
    centroids = (
        df.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .orderBy(F.pmod(F.xxhash64(F.col("cid"), F.lit(seed)), F.lit(1_000_003)))
        .limit(n_centroids)
    )
    q = _query_lit(query_vec)
    # nearest centroid per vector (broadcast join: centroids are tiny)
    assigned = (
        df.join(F.broadcast(centroids))
        .withColumn("cdist", V.l2_distance(F.col(vec_col), F.col("cvec")))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy(id_col).orderBy("cdist", "cid")),
        )
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, "cid")
    )
    probe_cids = [
        r["cid"]
        for r in centroids.withColumn("qdist", V.l2_distance(F.col("cvec"), q))
        .orderBy("qdist", "cid")
        .limit(n_probe)
        .collect()
    ]
    return (
        assigned.filter(F.col("cid").isin(probe_cids))
        .select(
            F.col(id_col),
            F.round(V.cosine(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def pairwise_cosine_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 6,
) -> DataFrame:
    """Embedding near-dup pairs: LSH-bucket candidates then exact cosine —
    same verify-after-blocking discipline as MinHash-LSH text dedup."""
    bucketed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        V.lsh_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    cand = (
        bucketed.alias("a")
        .join(
            bucketed.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(V.cosine(F.col("a.vec"), F.col("b.vec")), 6).alias("cosine"),
        )
    )
    return cand.filter(F.col("cosine") >= threshold)
