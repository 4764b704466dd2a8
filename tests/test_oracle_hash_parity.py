"""Driver/local hash-parity guard (round-3 lesson).

The driver's correctness gate hashes cell values WITHOUT the integer
normalization our local gate's ``norm_cell`` applies, so a DuckDB column
that comes back as HUGEINT (pandas float64: ``7973.0``) mismatches a Spark
BIGINT (``7973``) even when values are identical.  Root cause: DuckDB
``SUM`` / ``list_sum`` / windowed ``SUM`` over integer inputs widens to
HUGEINT unless explicitly ``CAST(... AS BIGINT)``.

Two layers of defense:

1. ``test_no_hugeint_oracle_columns`` — plan every registered oracle
   through DuckDB and assert no output column has a type pandas would
   render as float (HUGEINT / UHUGEINT / UBIGINT).  This catches the whole
   class before a query ever enters the driver's certification window.
2. ``test_strict_hash_parity_previous_reds`` — re-hash the three frames
   that were red in CORRECTNESS_r03 with a STRICT hasher (no int
   normalization, emulating the driver) and assert Spark == DuckDB now.
3. ``test_strict_hasher_catches_uncast_hugeint`` — prove the strict hasher
   is actually stricter: an intentionally uncast SUM must mismatch.
"""

from __future__ import annotations

import glob
import hashlib
import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as E

# sf0.01, matching the driver's gate exactly — golden-fixture oracles
# (tx_compression_ratio) pin sf0.01 literals, and strict-hash parity at
# the certification scale is the property this guard exists for.
SF_DIR = "/root/testdata/sf0.01"

# DuckDB types pandas renders as float64/object instead of int64.
_FLOATY_INT_TYPES = {"HUGEINT", "UHUGEINT", "UBIGINT"}


def _duck():
    con = duckdb.connect()
    for p in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        t = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _strict_cell(v) -> str:
    """Driver-style stringification: NO int-normalization of floats."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return f"{v:.9g}" if v != int(v) or abs(v) >= 1e15 else f"{v:.1f}"
    return str(v)


def _strict_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    rows = [
        "\x01".join(_strict_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return hashlib.md5("\x02".join(rows).encode()).hexdigest()


def test_no_hugeint_oracle_columns():
    con = _duck()
    offenders = []
    for name, sql in E.oracle_sql().items():
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            if str(typ) in _FLOATY_INT_TYPES:
                offenders.append((name, col, str(typ)))
    assert not offenders, (
        "oracle output columns that pandas renders as float64 (driver "
        f"hash_match would fail): {offenders} — CAST(... AS BIGINT)"
    )


@pytest.mark.parametrize(
    "qname",
    [
        "tpch_q12_priority_shipping", "tx_gopher_quality", "tx_repetition",
        # round-5 rows-only conversions + the degree-cap audit — strict
        # driver-style hash before they enter a certification window
        "a11_host_distinct_hll", "ann_ivf_trained_topk",
        "ann_pq_trained_topk", "crawl_budget_epochs",
        "tx_compression_ratio", "tx_sentence_align",
        "gr_outlink_twins_excluded",
    ],
)
def test_strict_hash_parity_previous_reds(spark, qname):
    con = _duck()
    sdf = E.queries()[qname](spark, SF_DIR).toPandas()
    odf = con.sql(E.oracle_sql()[qname]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    assert _strict_hash(sdf) == _strict_hash(odf), (
        f"{qname}: strict (driver-style) hash mismatch — check for "
        "uncast HUGEINT sums or float-format drift in the oracle"
    )


def test_strict_hasher_catches_uncast_hugeint(spark):
    """An uncast integer SUM must FAIL the strict hash even though the
    lenient local norm_cell would pass it — proves this guard is stricter
    than the local gate and therefore driver-faithful."""
    con = _duck()
    # 7973-style value: SUM over integers -> HUGEINT -> pandas float64.
    odf = con.sql(
        "SELECT l_returnflag, SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END)"
        " AS n FROM lineitem GROUP BY 1"
    ).df()
    assert odf["n"].dtype == "float64"  # the HUGEINT->float64 rendering
    import pyspark.sql.functions as F

    sdf = (
        spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("l_quantity") > 25, 1).otherwise(0)).alias("n")
        )
        .toPandas()
    )
    assert _strict_hash(sdf) != _strict_hash(odf)
    # ...and the one-line CAST fix restores parity.
    fixed = con.sql(
        "SELECT l_returnflag, CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 "
        "ELSE 0 END) AS BIGINT) AS n FROM lineitem GROUP BY 1"
    ).df()
    assert _strict_hash(sdf) == _strict_hash(fixed)
