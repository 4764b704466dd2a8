"""Embedding math over ``array<float>`` columns as native expressions.

``F.aggregate``/``F.zip_with`` keep the arithmetic JVM-side; elements are
cast to double before accumulation so results are engine-portable (the
DuckDB oracle accumulates in double too). At 100 TB these expressions
vectorize inside whole-stage codegen — no Python in the scan path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
    )
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v))


def lsh_bucket(a: Column, n_planes: int = 8, seed: int = 7) -> Column:
    """Sign-random-projection LSH bucket id (0..2^n_planes-1) without real
    random planes: plane p's coefficient for dimension i is derived from a
    deterministic hash, so the same bucket function is computable anywhere.

    coeff(p, i) = +1 if xxhash64(p, i) even else -1
    bucket bit p = sign(sum_i coeff(p,i) * a[i])
    """
    idx = F.sequence(F.lit(0), F.size(a) - 1)

    def signed(p: int):
        return lambda x, i: F.when(
            F.pmod(F.xxhash64(F.lit(seed + p), i), F.lit(2)) == 0, x.cast("double")
        ).otherwise(-x.cast("double"))

    bucket = F.lit(0)
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(a, idx, signed(p)), F.lit(0.0), lambda acc, v: acc + v
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket
