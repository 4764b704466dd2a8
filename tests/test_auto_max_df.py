"""Default-on auto hot-key cap for fp/shingle self-joins (round-3 verdict
item 3): ``max_df="auto"`` derives the stop-gram document-frequency cap
from corpus size (~N^(1/3), floored), so a boilerplate fingerprint shared
by millions of docs can no longer make the fp-keyed self-join quadratic in
one bucket — while test-scale corpora stay byte-exact (floor dominates)."""

from web_crawler_spark.operators import dedup as D
from web_crawler_spark.operators.dedup import (
    auto_max_df,
    ngram_jaccard_pairs,
    winnow_overlap_pairs,
)


def test_auto_max_df_sizing():
    # floor dominates below floor^3 docs — small corpora stay exact
    assert auto_max_df(500) == 1024
    assert auto_max_df(10**6) == 1024
    # cbrt curve above: per-gram fan-out df²/2 ≤ N^(2/3)/2 — one task's
    # worth of rows even at web scale, never quadratic
    assert auto_max_df(10**10) == 2155
    cap = auto_max_df(10**10)
    assert cap * cap / 2 < 3e6
    assert auto_max_df(0) == 1024
    assert auto_max_df(50, floor=4) == 4


def test_winnow_auto_floor_binds_small_corpus_exact(spark):
    """Default auto cap (floor 1024) must not change results on a corpus
    of 6 docs — identical to explicit exact mode (max_df=None)."""
    boiler = "shared boilerplate words common to every single page footer"
    rows = [(i, f"doc {i} specific filler tokens " + boiler) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    auto = winnow_overlap_pairs(df, k=3, w=3, min_common=1).count()
    exact = winnow_overlap_pairs(
        df, k=3, w=3, min_common=1, max_df=None
    ).count()
    assert auto == exact == 15


def test_winnow_auto_drops_planted_hot_fingerprint(spark):
    """Planted corpus-wide boilerplate fingerprint: with the auto cap
    engaged (auto_floor lowered to emulate a million-doc-hot gram at test
    scale), candidate pair counts are bounded by the genuinely-shared
    content instead of C(N,2) from the hot key."""
    boiler = "shared boilerplate words common to every single page footer"
    rows = [(i, f"doc {i} specific filler tokens " + boiler) for i in range(12)]
    # docs 0/1 additionally share a real copied passage
    rows[0] = (0, "a genuine copied passage of real text " + boiler)
    rows[1] = (1, "a genuine copied passage of real text tail " + boiler)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = winnow_overlap_pairs(df, k=3, w=3, min_common=1,
                                max_df=None).count()
    assert full == 12 * 11 // 2  # hot fp joins everything
    capped = winnow_overlap_pairs(
        df, k=3, w=3, min_common=1, auto_floor=3
    ).collect()
    assert len(capped) < full
    assert {(r["id_a"], r["id_b"]) for r in capped} == {(0, 1)}


def test_ngram_auto_default_exact_and_capped(spark):
    docs = [(i, f"common word seq tail{i} x{i} y{i}") for i in range(40)]
    docs += [(100, "common word seq tail1 x1 z")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # default auto (floor 1024 >> 41 docs): identical to exact
    auto = ngram_jaccard_pairs(df, threshold=0.0).count()
    exact = ngram_jaccard_pairs(df, threshold=0.0, max_df=None).count()
    assert auto == exact == 41 * 40 // 2
    # auto with emulated scale (floor below the hot gram's df): hot
    # shingle dropped, only the genuine near-dup survives
    capped = ngram_jaccard_pairs(df, threshold=0.2, auto_floor=5)
    assert {(r["id_a"], r["id_b"]) for r in capped.collect()} == {(1, 100)}
