"""bloom_capacity_plan (dedup.py): optimal m/k from per-shard distinct
counts — hand-checked parameters, duplicate collapse, null keys, fpp
monotonicity."""

import hashlib
import math

from pyspark.sql import functions as F

from web_crawler_spark.operators import dedup as DD


def _df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "url_hash string")


def _bucket(k, n, salt="bplan"):
    h = hashlib.md5(f"{salt}:{k}".encode()).hexdigest()
    return int(h[:4], 16) % n


def test_optimal_parameters_hand_checked(spark):
    keys = [f"u{i}" for i in range(200)]
    out = DD.bloom_capacity_plan(_df(spark, keys), n_partitions=4,
                                 target_fpp=0.01).collect()
    by_pid = {r["partition_id"]: r for r in out}
    counts = {}
    for k in keys:
        counts[_bucket(k, 4)] = counts.get(_bucket(k, 4), 0) + 1
    assert {p: r["n_keys"] for p, r in by_pid.items()} == counts
    for p, r in by_pid.items():
        n = counts[p]
        m = math.ceil(n * -math.log(0.01) / math.log(2.0) ** 2)
        assert r["m_bits"] == m
        assert r["k_hashes"] == max(1, math.floor(m / n * math.log(2.0) + 0.5))
        assert r["mem_bytes"] == (m + 7) // 8
        # ~9.59 bits/key at 1% fpp — the textbook constant
        assert 9 <= m / n <= 10


def test_duplicates_do_not_inflate_capacity(spark):
    once = DD.bloom_capacity_plan(_df(spark, ["a", "b", "c"]),
                                  n_partitions=1).collect()
    thrice = DD.bloom_capacity_plan(_df(spark, ["a", "b", "c"] * 3),
                                    n_partitions=1).collect()
    assert [tuple(r) for r in once] == [tuple(r) for r in thrice]


def test_null_keys_dropped_and_fpp_monotone(spark):
    df = spark.createDataFrame([("a",), (None,), ("b",)], "url_hash string")
    out = DD.bloom_capacity_plan(df, n_partitions=1).collect()
    assert sum(r["n_keys"] for r in out) == 2
    loose = DD.bloom_capacity_plan(_df(spark, [f"u{i}" for i in range(50)]),
                                   n_partitions=1, target_fpp=0.1).collect()
    tight = DD.bloom_capacity_plan(_df(spark, [f"u{i}" for i in range(50)]),
                                   n_partitions=1, target_fpp=0.001).collect()
    assert tight[0]["m_bits"] > loose[0]["m_bits"]
    assert tight[0]["k_hashes"] > loose[0]["k_hashes"]
