"""Physical-plan regression tests — the scale-design contracts asserted as
plan shapes, so a refactor that silently breaks pushdown / broadcast /
top-k compilation fails CI instead of surviving as a 100× regression at
cluster scale. (Counterpart of the `.explain("formatted")` audits in
BENCH/BASELINE.md.)"""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_filter_pushdown_and_column_pruning(spark):
    """TPC-H q6 pattern: filters reach the parquet scan (PushedFilters) and
    the read schema prunes to the referenced columns only."""
    import __spark_entry__ as E

    df = E.queries()["tpch_q6_forecast_revenue"](spark, SF)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "l_quantity" in plan.split("PushedFilters")[1][:400]
    # ReadSchema prunes: a 2-measure agg must not read the whole lineitem row
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema
    assert "l_returnflag" not in read_schema


def test_small_dim_broadcasts(spark):
    """J1 and q14: the dim side compiles to BroadcastHashJoin — no
    shuffle-hash/sort-merge join for a broadcastable side."""
    import __spark_entry__ as E

    for q in ("j1_broadcast_join", "tpch_q14_promo_revenue"):
        plan = _plan(E.queries()[q](spark, SF))
        assert "BroadcastHashJoin" in plan, f"{q}: {plan[:800]}"


def test_topk_compiles_to_take_ordered(spark):
    """T1 top-k must be TakeOrderedAndProject, not a global sort."""
    import __spark_entry__ as E

    plan = _plan(E.queries()["t1_topk_orders"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan  # no full sort node


def test_extraction_stage_is_shuffle_free(spark):
    """The mapInPandas HTML extraction stage adds NO Exchange of its own —
    html bytes never shuffle (the input repartition, when present, happens
    on slim pre-extraction rows upstream)."""
    from web_crawler_spark.plans.extract import text_stage

    pages = spark.createDataFrame(
        [("u1", b"<p>hello</p>")], "url string, html binary"
    )
    plan = _plan(text_stage(pages))
    assert "Exchange" not in plan


def test_gopher_quality_is_pure_projection(spark):
    """Corpus quality flags annotate the scan: no Exchange, no Python."""
    from web_crawler_spark.operators.corpus import gopher_quality

    df = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(gopher_quality(df))
    assert "Exchange" not in plan
    assert "mapInPandas" not in plan.lower()


def test_minhash_band_join_shuffles_slim_rows(spark):
    """The MinHash LSH band self-join must not carry gram arrays through
    the join — only (id, band, band_sig) reach the SortMergeJoin/
    ShuffledHashJoin inputs."""
    from web_crawler_spark.operators.dedup import minhash_lsh_pairs

    df = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(minhash_lsh_pairs(df))
    # the band-join keys appear...
    assert "band_sig" in plan
    # ...and the join inputs do not project the grams array: every Exchange
    # below a join carries only slim columns (id/band/band_sig)
    for seg in plan.split("Exchange")[1:]:
        first_line = seg.splitlines()[0]
        if "band_sig" in first_line:
            assert "grams" not in first_line


def test_salted_join_equals_plain_join(spark):
    from pyspark.sql import functions as F

    from web_crawler_spark.operators.skew import salted_join

    # deliberately skewed: 90% of rows share one key
    big = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"cold{i}") for i in range(1000)],
        ["id", "k"],
    )
    dim = spark.createDataFrame(
        [("hot", 1.5)] + [(f"cold{i}", float(i)) for i in range(0, 1000, 10)],
        ["k", "w"],
    )
    plain = big.join(dim, "k", "inner").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    salted = salted_join(big, dim, "k", n_salts=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # left join keeps unmatched big rows exactly once
    big2 = big.union(spark.createDataFrame([(9999, "nomatch")], ["id", "k"]))
    left = salted_join(big2, dim, "k", n_salts=4, how="left")
    assert left.filter(F.col("k") == "nomatch").count() == 1
    import pytest as _pytest
    with _pytest.raises(ValueError):
        salted_join(big, dim, "k", how="full")


def test_bm25_scoring_stage_is_shuffle_free(spark):
    """bm25_topk's scoring scan: per-term tf as array expressions + a
    TakeOrderedAndProject — the ONLY exchange in the plan is the top-k's
    final single-partition merge (no hash-partition shuffle, no join)."""
    import __spark_entry__ as E

    df = E.queries()["tx_bm25_topk"](spark, SF)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "hashpartitioning" not in plan


def test_knn_join_lsh_single_bucket_join(spark):
    """knn_join_lsh: exactly one equi-join (on the bucket id) and one
    window shuffle (per-query top-k) — no cross join, no nested-loop."""
    from web_crawler_spark.operators.similarity import knn_join_lsh

    emb = spark.read.parquet(SF + "/embeddings.parquet")
    plan = _plan(knn_join_lsh(emb, k=3, n_planes=5))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # candidate generation is a single equi-join on bucket
    n_joins = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") + plan.count("BroadcastHashJoin")
    assert n_joins == 1, plan[:2000]


def test_ivf_trained_assignment_is_join_free(spark):
    """ivf_topk(centroids=trained): the assignment+probe stage must stay
    the zero-join argmin expression (same contract as the sampled path)."""
    from web_crawler_spark.operators.similarity import ivf_topk, kmeans_centroids

    emb = spark.read.parquet(SF + "/embeddings.parquet")
    cents = kmeans_centroids(emb, n_centroids=4, iters=1)
    q = [0.0] * len(cents[0][1])
    plan = _plan(ivf_topk(emb, q, k=5, centroids=cents, n_probe=2))
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_triangles_no_cartesian(spark):
    """The wedge and closure joins are equi-joins on (u) / (v1, v2) —
    never a cartesian or broadcast-nested-loop explosion."""
    from web_crawler_spark.operators.graph import triangles

    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
        ["src_host", "dst_host"],
    )
    plan = _plan(triangles(df))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_kcore_hindex_uses_window_not_collect(spark):
    """The H-index is a rank window + agg — no collect_list of neighbor
    values anywhere in the per-round plan (hub-degree safety)."""
    from web_crawler_spark.operators.graph import kcore

    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src_host", "dst_host"]
    )
    plan = _plan(kcore(df, rounds=2))
    assert "collect_list" not in plan
    assert "CartesianProduct" not in plan


def test_bpe_pair_count_has_partial_aggregation(spark):
    """The merge-round pair count must map-side combine (partial_sum
    before the exchange) — the property that bounds each round's shuffle
    by distinct-pair count, not corpus size. Asserted on the round's
    pair-explode + agg plan built exactly as train_bpe_distributed does."""
    from web_crawler_spark.functions.bpe import _EOW, _SEP

    sep = _SEP
    docs = spark.createDataFrame(
        [("aa bb aa",), ("bb aa bb",)], ["text"]
    )
    words = docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
    )
    wrapped = F.concat(
        F.regexp_replace(F.col("w"), "(.)", sep + "$1" + sep),
        F.lit(sep + _EOW + sep),
    )
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq")).select(
        "freq", wrapped.alias("sym")
    )
    arr = F.split(
        F.regexp_replace(F.col("sym"), f"^{sep}|{sep}$", ""), sep + sep
    )
    pairs = vocab.select(
        "freq",
        F.explode(
            F.arrays_zip(
                F.slice(arr, 1, F.size(arr) - 1).alias("l"),
                F.slice(arr, 2, F.size(arr) - 1).alias("r"),
            )
        ).alias("p"),
    ).select(F.col("p.l").alias("l"), F.col("p.r").alias("r"), "freq")
    agg = pairs.groupBy("l", "r").agg(F.sum("freq").alias("cnt"))
    plan = _plan(agg)
    assert "partial_sum" in plan or "partial_finalmerge" in plan.lower() or plan.count("HashAggregate") >= 2


def test_entry_module_has_no_duplicate_toplevel_defs():
    """Guard against silent shadowing: in an 11k-line registry module a
    re-used helper name (def _q_x twice, or _SQL_X assigned twice) makes
    the LAST definition win for EVERY registry entry referencing the
    name — an existing certified query silently starts running a
    different plan. Caught live once (mirror_hosts); never again."""
    import ast
    from collections import Counter

    tree = ast.parse(open("__spark_entry__.py").read())
    names = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            names.append(node.name)
        elif isinstance(node, ast.Assign):
            # a bare `X = None` is the module's forward-declaration idiom,
            # not a second definition
            if (
                isinstance(node.value, ast.Constant)
                and node.value.value is None
            ):
                continue
            for t in node.targets:
                if isinstance(t, ast.Name):
                    names.append(t.id)
    dupes = {n: c for n, c in Counter(names).items() if c > 1}
    assert not dupes, f"duplicate top-level definitions: {dupes}"


def test_related_hosts_equi_join_only(spark):
    """related_hosts: the pair stage is an equi-join on the shared key
    (the it_a < it_b predicate rides the join, not a cartesian) and the
    degree joins are equi-joins — no cartesian/nested-loop anywhere."""
    from web_crawler_spark.operators.graph import related_hosts

    df = spark.createDataFrame(
        [("k1", "A"), ("k1", "B"), ("k2", "A"), ("k2", "B")],
        ["src_host", "dst_host"],
    )
    plan = _plan(related_hosts(df, max_degree=8, min_shared=1))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_host_lookalikes_no_distance_cross_join(spark):
    """host_lookalikes: candidates come from the deletion-variant
    equi-join; levenshtein runs only on the joined pairs — the plan must
    contain no cartesian/nested-loop (the thing the SymSpell trick
    exists to avoid)."""
    from web_crawler_spark.operators.urlfilter import host_lookalikes

    df = spark.createDataFrame(
        [("shop.com",), ("shoop.com",), ("sh0p.com",)], ["host"]
    )
    plan = _plan(host_lookalikes(df))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tfidf_keywords_join_free(spark):
    """tfidf_keywords: df via a count window over the postings — the
    plan must contain NO join (the docstring's no-join-anywhere claim)."""
    from web_crawler_spark.operators.corpus import tfidf_keywords

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b"), (3, "a")], ["doc_id", "text"]
    )
    plan = _plan(tfidf_keywords(df, k=2))
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_template_burden_text_pruned_before_exchange(spark):
    """template_burden: the md5 surrogate is projected before every
    exchange — the raw text column must not appear in any Exchange
    input (page text never crosses a shuffle)."""
    from web_crawler_spark.operators.boilerplate import template_burden

    df = spark.createDataFrame(
        [("h", "u1", "nav\nbody1"), ("h", "u2", "nav\nbody2"),
         ("h", "u3", "nav\nbody3")],
        ["host", "url", "text"],
    )
    plan = _plan(template_burden(df))
    # every hashpartitioning clause keys on host/url/line_hash — never text
    import re
    for m in re.findall(r"hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m, m


def test_trawl_cores_no_cartesian_slim_joins(spark):
    """trawl_cores: candidate enumeration must stay keyed self-equi-joins
    on fan — no cartesian, no nested-loop — and the shuffled rows are slim
    string tuples (no payload columns in the exchange)."""
    from web_crawler_spark.operators.graph import trawl_cores

    e = spark.createDataFrame(
        [(f"f{i}", f"c{(i * 3 + k) % 7}") for i in range(12) for k in range(4)],
        ["src_host", "dst_host"],
    )
    plan = _plan(trawl_cores(e, j=3, min_fans=2, prune_rounds=0))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_community_modularity_label_keyed_aggs(spark):
    """community_modularity: degree/intra stages are label-keyed aggs after
    slim label joins — no cartesian, no nested-loop anywhere."""
    from web_crawler_spark.operators.graph import community_modularity

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src_host", "dst_host"]
    )
    lab = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "y")], ["node", "label"]
    )
    plan = _plan(community_modularity(e, lab))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
