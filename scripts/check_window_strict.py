#!/usr/bin/env python
"""Strict driver-style hash check over the CURRENT certification window
(the first 50 queries() entries) at sf0.01 — the exact comparison the
grading driver runs: row count, sorted column names, and a value hash
with NO integer normalization of floats. Run this before every window
rotation; a red here would be a red in CORRECTNESS_r{N}."""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def strict_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return f"{v:.9g}" if v != int(v) or abs(v) >= 1e15 else f"{v:.1f}"
    return str(v)


def strict_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    rows = [
        "\x01".join(strict_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return hashlib.md5("\x02".join(rows).encode()).hexdigest()


def main() -> int:
    import __spark_entry__ as E
    from web_crawler_spark.session import get_spark

    spark = get_spark(master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = E.queries(), E.oracle_sql()
    window = list(qs)[:50]
    failures = []
    for name in window:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows [rows-only]")
            continue
        odf = con.execute(oracles[name]).fetchdf()
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append("columns differ")
        elif strict_hash(sdf) != strict_hash(odf):
            problems.append("STRICT value-hash mismatch")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"ok    {name}: {len(sdf)} rows ({time.time() - t0:.1f}s)")
    spark.stop()
    print(f"\n{len(failures)} strict failures"
          + (f": {failures}" if failures else " over 50 window queries"))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
