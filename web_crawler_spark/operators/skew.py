"""Skew-mitigation utilities.

The epoch engine salts its per-host scheduling internally
(plans/epoch.py); this module exposes the same discipline as a reusable
operator for large×medium equi-joins on skewed keys — the case where the
build side is too big to broadcast and AQE's sort-merge skew split is
unavailable (e.g. the join must stay a shuffled hash join, or the skew is
in the stream side's key distribution rather than partition sizes).

``salted_join(big, medium, key, n_salts=S)`` appends ``salt = xxhash64(
whole big row) % S`` on the probe side and explodes the build side S ways,
so one hot key spreads over S reducers. Join output is exactly the plain
join (multiset-equal); cost is S× the build side's shuffle volume — the
standard trade [Beame et al., skew joins; same trick as Spark AQE's
OptimizeSkewedJoin but applicable before runtime and to hash joins].
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    medium: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ medium`` on ``on`` with the hot-key salt trick.

    The salt is deterministic per big-side row (xxhash64 over all its
    columns, mod ``n_salts``) so re-runs shuffle identically; the medium
    side is replicated ``n_salts`` times via a literal-range explode (a
    map-side operation — no shuffle added beyond the S× volume). Result
    columns = big's then medium's non-key columns, exactly like
    ``big.join(medium, on, how)``.

    Supported ``how``: inner / left / left_outer (the replicated build
    side makes right/full joins produce S copies of unmatched build rows —
    refuse rather than silently duplicate).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salt_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    salt_medium = medium.withColumn(
        "__salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    )
    out = salt_big.join(salt_medium, keys + ["__salt"], how)
    return out.drop("__salt")
