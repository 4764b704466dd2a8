"""corpus_mix / corpus_mix_sampled (operators/corpus.py): token-budget
source mixing. Exact variant: greedy cut in deterministic md5 order,
overshoot bounded by one document per source. Sampled variant: window-free
md5-percentile admission, deterministic across runs."""

from pyspark.sql import functions as F

from web_crawler_spark.operators import corpus as C


def _corpus(spark):
    # source A: 10 docs x 10 tokens; source B: 5 docs x 4 tokens
    rows = [(i, "A", " ".join(f"w{i}_{j}" for j in range(10))) for i in range(10)]
    rows += [(100 + i, "B", " ".join(f"b{i}_{j}" for j in range(4))) for i in range(5)]
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def _budgets(spark, a, b):
    return spark.createDataFrame([("A", a), ("B", b)], ["source", "token_budget"])


def test_exact_mix_greedy_cut_and_overshoot_bound(spark):
    mix = C.corpus_mix(_corpus(spark), _budgets(spark, 35, 1000)).collect()
    a = [r for r in mix if r.source == "A"]
    b = [r for r in mix if r.source == "B"]
    # A: 10-token docs against a 35-token budget -> exactly 4 admitted
    # (cum-n_tokens = 0,10,20,30 < 35; the 5th starts at 40)
    assert len(a) == 4 and sum(r.n_tokens for r in a) == 40
    # B: budget exceeds the source -> everything admitted
    assert len(b) == 5 and sum(r.n_tokens for r in b) == 20
    # deterministic: same admit set on re-run
    again = C.corpus_mix(_corpus(spark), _budgets(spark, 35, 1000)).collect()
    assert sorted(r.doc_id for r in again) == sorted(r.doc_id for r in mix)


def test_adaptive_plan_picks_window_when_sources_fit(spark):
    # 10-row max source << default 2M threshold -> window path
    mix = C.corpus_mix(_corpus(spark), _budgets(spark, 35, 1000)).collect()
    assert C.LAST_MIX_PLAN["path"] == "window"
    assert C.LAST_MIX_PLAN["max_source_rows"] == 10
    assert len(mix) == 9


def test_adaptive_plan_prefixsum_engages_on_skewed_fixture(spark):
    # Skewed fixture: source A holds nearly all rows; with the task-fit
    # threshold below A's row count the probe must choose the two-level
    # prefix-sum scan...
    mix_ps = C.corpus_mix(
        _corpus(spark), _budgets(spark, 35, 1000), window_path_max_rows=5
    )
    got_ps = sorted(r.doc_id for r in mix_ps.collect())
    assert C.LAST_MIX_PLAN["path"] == "prefixsum"
    assert C.LAST_MIX_PLAN["max_source_rows"] == 10
    # ...and the two physical plans are admit-identical.
    mix_w = C.corpus_mix(
        _corpus(spark), _budgets(spark, 35, 1000), plan="window"
    )
    assert C.LAST_MIX_PLAN["path"] == "window"
    assert sorted(r.doc_id for r in mix_w.collect()) == got_ps
    mix_forced = C.corpus_mix(
        _corpus(spark), _budgets(spark, 35, 1000), plan="prefixsum"
    )
    assert sorted(r.doc_id for r in mix_forced.collect()) == got_ps


def test_zero_budget_admits_nothing(spark):
    mix = C.corpus_mix(_corpus(spark), _budgets(spark, 0, 0))
    assert mix.count() == 0


def test_sampled_mix_deterministic_and_rate_capped(spark):
    corpus = _corpus(spark)
    m1 = sorted(r.doc_id for r in C.corpus_mix_sampled(corpus, _budgets(spark, 50, 1000)).collect())
    m2 = sorted(r.doc_id for r in C.corpus_mix_sampled(corpus, _budgets(spark, 50, 1000)).collect())
    assert m1 == m2  # no RNG state: md5-percentile membership
    # rate caps at 1.0: budget >= total admits the whole source
    full = C.corpus_mix_sampled(corpus, _budgets(spark, 1000, 1000))
    assert full.count() == 15
    # sampled set is a subset of the corpus with source-consistent rows
    ids = {r.doc_id for r in corpus.collect()}
    assert set(m1) <= ids


def test_sampled_mix_high_source_cardinality(spark):
    # per-domain weighting regime: 10k sources must not explode the plan
    # (rates are a broadcast-joined DataFrame, not a create_map literal)
    n = 10_000
    corpus = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("dom"), (F.col("id") % n).cast("string")).alias("source"),
        F.lit("one two three four").alias("text"),
    )
    budgets = spark.range(n).select(
        F.concat(F.lit("dom"), F.col("id").cast("string")).alias("source"),
        # even ids: full budget; odd ids: zero budget
        F.when(F.col("id") % 2 == 0, F.lit(100)).otherwise(F.lit(0)).alias("token_budget"),
    )
    mix = C.corpus_mix_sampled(corpus, budgets)
    rows = mix.collect()
    assert len(rows) == n // 2
    assert all(int(r.source[3:]) % 2 == 0 for r in rows)
    # sources absent from the budgets table admit nothing
    half = budgets.filter(F.col("source").isin(["dom0", "dom2"]))
    small = C.corpus_mix_sampled(corpus, half).collect()
    assert sorted(r.source for r in small) == ["dom0", "dom2"]
