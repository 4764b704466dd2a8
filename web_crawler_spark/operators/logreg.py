"""Distributed logistic-regression training as pure DataFrame aggregates
(engine addition) — run-invariant via fixed-point gradient accumulation.

Why this exists: a webtext pipeline distills its rule gates (Gopher/C4
flags, human labels) into a differentiable quality scorer it can
threshold and calibrate — the FineWeb-Edu / DCLM-classifier pattern. The
engine already SCORES hashed linear models (`corpus.py::quality_model_
score`); this module TRAINS the weights in-engine with batch gradient
descent, no MLlib, no sklearn.

The distributed-determinism trick (the same discipline as the fixed-point
logs in ``operators/lm.py``): naive GD sums float gradients, so the
learned weights depend on partition/aggregation order — retrain the same
data, get ulp-different weights. Here every per-row gradient contribution
is quantized ``floor(g · 2^20)`` to int64 BEFORE the aggregate, so the
per-iteration sums are order-independent integers and the weight
trajectory is a pure function of (data, hyperparameters) — bit-identical
across partitionings, engines, and cluster sizes. That's what makes the
5-iteration training loop ORACLE-CERTIFIABLE in DuckDB (unrolled CTEs,
the pagerank-oracle pattern).

Scale shape: one full-table aggregate per iteration — each is a map-side
partial sum of (n_features+2) int64s per partition, a few hundred bytes
crossing the wire regardless of corpus size. Weights live on the driver
(tens of floats) and fold back in as literals. For feature exactness use
integer-derived features scaled by POWERS OF TWO only (exact float ops);
any other scaling still trains fine but loses cross-engine bit-parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRAD_FP = 1 << 20  # fixed-point scale for gradient/loss quantization


def _z(w: list[float], feature_cols: list[str]) -> Column:
    z = F.lit(float(w[0]))
    for j, c in enumerate(feature_cols):
        z = z + F.lit(float(w[j + 1])) * F.col(c)
    return z


def train_logreg(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 5,
    lr: float = 16.0,
    fp: int = GRAD_FP,
) -> tuple[list[float], list[int]]:
    """Batch-GD logistic regression. Returns (weights, loss_trace):
    ``weights[0]`` is the bias, ``weights[1:]`` align with feature_cols;
    ``loss_trace[i]`` is the fixed-point total log-loss AFTER iteration i
    (an exact int — assert monotone decrease in tests without float
    tolerance games).

    Each iteration: score with the current weights folded as literals,
    quantize per-row gradient contributions to int64, one global agg,
    driver-side weight update. n is fetched once (scalar count).
    """
    n = df.count()
    if n == 0:
        raise ValueError("cannot train on an empty frame")
    y = F.col(label_col).cast("double")
    w = [0.0] * (len(feature_cols) + 1)
    trace: list[int] = []
    for _ in range(iters):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(w, feature_cols)))
        err = p - y
        aggs = [F.sum(F.floor(err * fp)).alias("g0")]
        aggs += [
            F.sum(F.floor(err * F.col(c) * fp)).alias(f"g{j + 1}")
            for j, c in enumerate(feature_cols)
        ]
        row = df.agg(*aggs).collect()[0]
        w = [
            w[k] - lr * (int(row[f"g{k}"]) / fp) / n
            for k in range(len(w))
        ]
        p2 = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(w, feature_cols)))
        loss = -(y * F.log(p2) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - p2))
        trace.append(
            int(df.agg(F.sum(F.floor(loss * fp))).collect()[0][0])
        )
    return w, trace


def predict_logreg(
    df: DataFrame,
    weights: list[float],
    feature_cols: list[str],
    score_col: str = "score",
    pred_col: str = "pred",
    threshold: float = 0.5,
) -> DataFrame:
    """Append sigmoid score (rounded to 6, the knn-cosine discipline) and
    the thresholded prediction."""
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(weights, feature_cols)))
    return df.withColumn(score_col, F.round(p, 6)).withColumn(
        pred_col, (F.col(score_col) > threshold).cast("int")
    )


def duckdb_train_sql(
    feature_exprs: list[str],
    label_expr: str,
    source_cte: str,
    iters: int = 5,
    lr: float = 16.0,
    fp: int = GRAD_FP,
) -> str:
    """CTE chain mirroring :func:`train_logreg` bit-for-bit: ``lrf`` is
    the feature frame (built from ``source_cte``), ``it{iters}`` is the
    single-row final-weights relation with columns w0..w{k}. Compose as
    ``WITH {this} SELECT ... FROM lrf, it{iters}``."""
    k = len(feature_exprs)
    xs = ", ".join(f"({e}) AS x{j + 1}" for j, e in enumerate(feature_exprs))
    parts = [
        f"lrf AS (SELECT {xs}, CAST(({label_expr}) AS DOUBLE) AS y,"
        f" * FROM ({source_cte}))",
        "lrn AS (SELECT COUNT(*) AS n FROM lrf)",
        "it0 AS (SELECT "
        + ", ".join(f"CAST(0.0 AS DOUBLE) AS w{j}" for j in range(k + 1))
        + ")",
    ]
    for i in range(1, iters + 1):
        prev = f"it{i - 1}"
        z = " + ".join([f"p.w0"] + [f"p.w{j + 1} * f.x{j + 1}" for j in range(k)])
        err = f"(1.0 / (1.0 + exp(-({z}))) - f.y)"
        gsel = ", ".join(
            [f"sum(floor({err} * {fp})) AS g0"]
            + [
                f"sum(floor({err} * f.x{j + 1} * {fp})) AS g{j + 1}"
                for j in range(k)
            ]
            + [", ".join(f"p.w{j}" for j in range(k + 1))]
        )
        gby = ", ".join(f"p.w{j}" for j in range(k + 1))
        upd = ", ".join(
            f"w{j} - {lr} * (g{j} / {fp}) / (SELECT n FROM lrn) AS w{j}"
            for j in range(k + 1)
        )
        parts.append(
            f"g{i} AS (SELECT {gsel} FROM lrf f CROSS JOIN {prev} p"
            f" GROUP BY {gby})"
        )
        parts.append(f"it{i} AS (SELECT {upd} FROM g{i})")
    return ",\n".join(parts)


def url_features(url_col: Column) -> list[Column]:
    """URL-only features for learned frontier prioritization — every one
    computable by the SQL oracle with the same string ops: path depth
    (slash count), query-param count, length/100, contains-a-digit flag.
    URL-only matters: the frontier has not FETCHED these pages yet, so
    page content cannot be a feature (Cho, Garcia-Molina & Page 1998's
    importance-prediction constraint)."""
    u = url_col.cast("string")
    slashes = (F.length(u) - F.length(F.replace(u, F.lit("/"), F.lit("")))).cast(
        "double"
    )
    params = (
        F.when(
            F.instr(u, "?") > 0,
            F.length(u) - F.length(F.replace(u, F.lit("&"), F.lit(""))) + 1,
        )
        .otherwise(F.lit(0))
        .cast("double")
    )
    length = F.length(u).cast("double") / F.lit(100.0)
    digit = F.regexp_like(u, F.lit("[0-9]")).cast("double")
    return [slashes, params, length, digit]


URL_FEATURE_SQL = [
    "CAST(length(url) - length(replace(url, '/', '')) AS DOUBLE)",
    "CAST(CASE WHEN strpos(url, '?') > 0"
    " THEN length(url) - length(replace(url, '&', '')) + 1"
    " ELSE 0 END AS DOUBLE)",
    "CAST(length(url) AS DOUBLE) / 100.0",
    "CAST(CASE WHEN regexp_matches(url, '[0-9]') THEN 1 ELSE 0 END AS DOUBLE)",
]


def learned_priority(
    crawled: DataFrame,
    frontier: DataFrame,
    label_col: str = "label",
    url_col: str = "url",
    iters: int = 5,
    lr: float = 16.0,
) -> DataFrame:
    """Machine-learned frontier prioritization: train the in-engine
    logistic regression on CRAWLED urls' observed outcomes (did the
    fetch yield a keeper? — any boolean the pipeline already computes:
    quality gate, dedup survival, extraction success), then score every
    UNCRAWLED frontier url from its URL string alone and rank the
    frontier by predicted yield. The supervised sibling of the
    topic-driven :func:`..snapshots.focused_priority` — this one learns
    whatever the labels encode instead of assuming a topic vocabulary.

    Returns (url, score, rank): score = round(sigmoid(w·x), 6), rank
    dense over (score desc, url) via the distributed prefix sum — no
    single-partition window at any frontier size. Training is
    :func:`train_logreg` (int64-quantized gradients — the weight
    trajectory is partition-invariant, so the whole train+score chain
    is oracle-replayable as unrolled SQL via :func:`duckdb_train_sql`).
    """
    from .prefixsum import prefix_sum

    feat_names = [f"x{j + 1}" for j in range(4)]
    feats = url_features(F.col(url_col))
    train = crawled.select(
        *[c.alias(n) for c, n in zip(feats, feat_names)],
        F.col(label_col),
    )
    w, _trace = train_logreg(train, feat_names, label_col, iters=iters, lr=lr)

    scored = predict_logreg(
        frontier.select(
            F.col(url_col).alias("url"),
            *[c.alias(n) for c, n in zip(url_features(F.col(url_col)), feat_names)],
        ),
        w,
        feat_names,
    ).select("url", "score")
    ranked = prefix_sum(
        scored.withColumn("_one", F.lit(1)).withColumn(
            "_neg", -F.col("score")
        ),
        ["_neg", "url"],
        "_one",
        "rank",
    )
    return ranked.select("url", "score", F.col("rank").cast("long").alias("rank"))
