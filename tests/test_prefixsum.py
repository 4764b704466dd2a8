"""Distributed prefix sum + byte-balanced shard packing
(operators/prefixsum.py): two-level scan must equal the single-window
global cumsum exactly, without any row-level single-partition exchange."""

import pyspark.sql.functions as F

from web_crawler_spark.operators import prefixsum as PS


def test_prefix_sum_equals_global_window(spark):
    # keys deliberately unsorted and non-contiguous; values signed
    rows = [(i * 37 % 1009, (i % 13) - 3) for i in range(1009)]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {r["k"]: r["cum"] for r in PS.prefix_sum(df, "k", "v", n_partitions=8).collect()}
    expect, run = {}, 0
    for k, v in sorted(rows):
        run += v
        expect[k] = run
    assert got == expect


def test_prefix_sum_no_single_partition_row_exchange(spark):
    df = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    out = PS.prefix_sum(df, "k", "v", n_partitions=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the row-level window must be partitioned by the range-bucket id —
    # never an unpartitioned (all-rows-through-one-task) window
    assert "windowspecdefinition(__part#" in plan
    # exactly one SinglePartition exchange, and it sits on the
    # n_partitions-row offsets aggregate, not the row-level side
    assert plan.count("Exchange SinglePartition") == 1
    assert "__part_sum" in plan


def test_shard_pack_greedy_bins(spark):
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "bbbb"), (3, "cc"), (4, "dddddddddd"), (5, "e")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: (r["n_bytes"], r["cum_bytes"], r["shard_id"])
           for r in PS.shard_pack(docs, target_bytes=8, n_partitions=4).collect()}
    # cum: 4, 8, 10, 20, 21 -> start bytes 0,4,8,10,20 -> shards 0,0,1,1,2
    assert got[1] == (4, 4, 0)
    assert got[2] == (4, 8, 0)
    assert got[3] == (2, 10, 1)
    assert got[4] == (10, 20, 1)
    assert got[5] == (1, 21, 2)


def test_shard_pack_utf8_bytes_not_chars(spark):
    docs = spark.createDataFrame([(1, "héllo")], ["doc_id", "text"])
    row = PS.shard_pack(docs, target_bytes=100).collect()[0]
    assert row["n_bytes"] == 6  # é is 2 bytes


def test_grouped_prefix_sum_matches_per_group_cumsum(spark):
    rows = [((i * 31) % 7, i * 13 % 501, (i % 11) + 1) for i in range(501)]
    df = spark.createDataFrame(rows, ["g", "k", "v"])
    got = {(r["g"], r["k"]): r["cum"]
           for r in PS.prefix_sum(df, "k", "v", n_partitions=8,
                                  partition_cols=["g"]).collect()}
    expect, run = {}, {}
    for g, k, v in sorted(rows):
        run[g] = run.get(g, 0) + v
        expect[(g, k)] = run[g]
    assert got == expect


def test_grouped_prefix_sum_multi_order_cols(spark):
    rows = [(0, "b", 1, 10), (0, "a", 2, 1), (0, "a", 1, 5), (1, "a", 1, 7)]
    df = spark.createDataFrame(rows, ["g", "o1", "o2", "v"])
    got = {(r["g"], r["o1"], r["o2"]): r["cum"]
           for r in PS.prefix_sum(df, ["o1", "o2"], "v", n_partitions=4,
                                  partition_cols=["g"]).collect()}
    assert got[(0, "a", 1)] == 5
    assert got[(0, "a", 2)] == 6
    assert got[(0, "b", 1)] == 16
    assert got[(1, "a", 1)] == 7


def test_curriculum_shards_equal_cuts_best_first(spark):
    import pyspark.sql.functions as F

    from web_crawler_spark.operators.corpus import curriculum_shards

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 31) % 17).cast("double").alias("q"),
    )
    got = curriculum_shards(df, "q", n_shards=4, n_partitions=8).collect()
    by_shard = {}
    for r in got:
        by_shard.setdefault(r["shard"], []).append((r["rank"], r["quality"]))
    assert sorted(by_shard) == [0, 1, 2, 3]
    assert all(len(v) == 25 for v in by_shard.values())
    # shard 0 holds the best quality; ranks are the exact quartiles
    assert min(q for _, q in by_shard[0]) >= max(q for _, q in by_shard[3])
    assert sorted(r for r, _ in by_shard[0]) == list(range(1, 26))
    assert sorted(r for r, _ in by_shard[3]) == list(range(76, 101))
