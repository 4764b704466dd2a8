"""Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 / MOSS) —
differential parity vs an independent pure-Python reference, the paper's
locality guarantee, overlap-pair detection, and plan-shape contracts."""

import hashlib

import pytest
from hypothesis import given, settings, strategies as st

from web_crawler_spark.operators.dedup import (
    winnow_fingerprints,
    winnow_overlap_pairs,
)


def _h60(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:15], 16)


def _ref_winnow(text: str, k: int, w: int) -> set:
    """Independent reference: basic winnowing with rightmost-min tie-break;
    short docs (< w grams) winnowed as a single window."""
    toks = text.lower().split()
    H = [_h60(" ".join(toks[i:i + k])) for i in range(len(toks) - k + 1)]
    if not H:
        return set()
    wl = min(w, len(H))
    out = set()
    for i in range(len(H) - wl + 1):
        win = H[i:i + wl]
        m = min(win)
        out.add((i + max(j for j in range(wl) if win[j] == m), m))
    return out


def _spark_fps(spark, texts, k, w):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    return got


def test_reference_parity_fixed_corpus(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog and runs home",
        "a b",                      # shorter than k
        "",                         # empty
        "one two three four five",  # fewer grams than w
        "rep rep rep rep rep rep rep rep",  # all-equal hashes: tie-break path
    ]
    for k, w in [(3, 4), (5, 4), (2, 2)]:
        got = _spark_fps(spark, texts, k, w)
        for i, t in enumerate(texts):
            assert got.get(i, set()) == _ref_winnow(t, k, w), (k, w, i)


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40),
        min_size=1,
        max_size=4,
    )
)
def test_reference_parity_property(spark, texts):
    """Random 2-letter-alphabet docs maximize hash ties and boundary cases;
    the Spark selection set must equal the reference exactly."""
    got = _spark_fps(spark, texts, 2, 3)
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _ref_winnow(t, 2, 3), (i, t)


def test_locality_guarantee_shared_run(spark):
    """The paper's correctness property: two docs sharing a token run of
    length >= w + k - 1 share at least one fingerprint HASH, wherever the
    run sits in either document."""
    k, w = 4, 4
    shared = "lorem ipsum dolor sit amet consectetur adipiscing"  # 7 = w+k-1
    texts = [
        "completely different prefix words here " + shared,
        shared + " and an unrelated suffix trail of tokens",
    ]
    got = _spark_fps(spark, texts, k, w)
    fps0 = {fp for _, fp in got.get(0, set())}
    fps1 = {fp for _, fp in got.get(1, set())}
    assert fps0 & fps1, "locality guarantee violated"


def test_density_bound(spark):
    """Winnowing selects at most one fingerprint per window start — the
    fingerprint count is bounded by n_grams - min(w, n_grams) + 1 and is
    at least 1 for any doc with >= 1 gram."""
    k, w = 3, 4
    text = " ".join(f"t{i % 17}" for i in range(60))
    got = _spark_fps(spark, [text], k, w)[0]
    n_grams = 60 - k + 1
    assert 1 <= len(got) <= n_grams - w + 1


def test_overlap_pairs_detects_planted_copy(spark):
    boiler = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, "unique opening words one two three " + boiler),
        (2, boiler + " tail words four five six seven"),
        (3, "entirely unrelated content about other topics nine ten"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = winnow_overlap_pairs(df, k=3, w=3, min_common=1).collect()
    keys = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in keys
    assert not any(3 in p for p in keys)
    r = next(r for r in pairs if (r["id_a"], r["id_b"]) == (1, 2))
    assert 0 < r["overlap"] <= 1.0
    assert r["n_common"] <= min(r["n_a"], r["n_b"])


def test_overlap_pairs_max_df_drops_hot_fingerprint(spark):
    """A fingerprint shared by every doc (site boilerplate) is dropped by
    max_df before the self-join; pair counts shrink accordingly."""
    boiler = "shared boilerplate words common to every single page footer"
    rows = [(i, f"doc {i} specific filler tokens " + boiler) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = winnow_overlap_pairs(df, k=3, w=3, min_common=1).count()
    capped = winnow_overlap_pairs(
        df, k=3, w=3, min_common=1, max_df=2
    ).count()
    assert full == 15  # all C(6,2) pairs share the boiler fingerprints
    assert capped < full


def test_fingerprint_scan_is_shuffle_free(spark):
    """The fingerprint stage is pure per-row array algebra: no Exchange in
    the executed plan."""
    df = spark.createDataFrame([(1, "a b c d e f g h")], "doc_id long, text string")
    plan = winnow_fingerprints(df, k=3, w=3)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def _spans(spark, rows, **kw):
    from web_crawler_spark.operators.dedup import winnow_shared_spans

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return winnow_shared_spans(df, **kw).collect()


def test_shared_span_offsets(spark):
    """A passage planted at KNOWN token offsets in both docs yields one
    span per pair whose bounds sit inside the passage and cover its
    interior (edges may lose up to ~w+k tokens to context-dependent
    window minima)."""
    k, w = 3, 3
    run = " ".join(f"s{i * 7 % 23}x{i}" for i in range(30))  # 30 tokens
    pre_a = "a1 a2 a3 a4 a5"          # run starts at token 5 in doc 1
    pre_b = "b1 b2 b3 b4 b5 b6 b7 b8"  # run starts at token 8 in doc 2
    rows = [
        (1, pre_a + " " + run + " a6 a7"),
        (2, pre_b + " " + run + " b9"),
    ]
    got = _spans(spark, rows, k=k, w=w, min_fps=2)
    assert len(got) == 1
    r = got[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    # diagonal = 5 - 8 = -3 throughout the run
    assert r["start_a"] - r["start_b"] == -3
    assert r["end_a"] - r["end_b"] == -3
    # bounds inside the planted run, interior covered
    assert 5 <= r["start_a"] <= 5 + (w + k)
    assert 5 + 30 - 1 - (w + k) <= r["end_a"] <= 5 + 30 - 1
    assert r["n_fps"] >= 2


def test_two_disjoint_passages_two_spans(spark):
    k, w = 3, 3
    run1 = " ".join(f"p{i * 5 % 17}q{i}" for i in range(20))
    run2 = " ".join(f"r{i * 11 % 19}s{i}" for i in range(20))
    rows = [
        (1, run1 + " gap1 gap2 gap3 gap4 gap5 gap6 gap7 gap8 gap9 " + run2),
        (2, run1 + " other filler words entirely different here now " + run2),
    ]
    got = _spans(spark, rows, k=k, w=w, min_fps=2)
    # the two runs sit on different diagonals only if prefixes differ —
    # here both docs start with run1 so diag 0 holds for both runs, but
    # the ~9-token unshared gap (> w) splits the chain into two islands
    assert len(got) >= 2
    starts = sorted(r["start_a"] for r in got)
    assert starts[0] < 20 <= starts[-1]


def test_min_fps_filters_singletons(spark):
    k, w = 3, 3
    run = "shared common tokens here now"  # 5 tokens: w+k-1 guarantee only
    rows = [
        (1, "unique aa bb cc " + run),
        (2, run + " dd ee ff other"),
    ]
    loose = _spans(spark, rows, k=k, w=w, min_fps=1)
    tight = _spans(spark, rows, k=k, w=w, min_fps=4)
    assert len(loose) >= 1
    assert all(r["n_fps"] >= 4 for r in tight)
    assert len(tight) <= len(loose)
