"""rbo_overlap (operators/corpus.py): rank-biased overlap at depth D —
hand-computed small cases + boundary semantics."""

import pytest

from web_crawler_spark.operators import corpus as C


def _runs(spark, a, b):
    ra = spark.createDataFrame(
        [("q", x, i + 1) for i, x in enumerate(a)],
        "qid string, doc_id string, rank long",
    )
    rb = spark.createDataFrame(
        [("q", x, i + 1) for i, x in enumerate(b)],
        "qid string, doc_id string, rank long",
    )
    return ra, rb


def _rbo_ref(a, b, p, depth):
    acc, w = 0.0, 1.0
    for d in range(1, depth + 1):
        overlap = len(set(a[:d]) & set(b[:d]))
        acc += w * overlap / d
        w *= p
    return (1.0 - p) * acc


def test_identical_rankings(spark):
    items = [f"d{i}" for i in range(5)]
    ra, rb = _runs(spark, items, items)
    r = C.rbo_overlap(ra, rb, p=0.9, depth=5).collect()[0]
    assert r["overlap_at_depth"] == 5
    assert r["rbo_at_depth"] == round(_rbo_ref(items, items, 0.9, 5), 6)
    # identical prefixes: overlap_d = d at every d, so RBO = (1-p)·Σp^(d-1)
    assert r["rbo_at_depth"] == round(
        0.09999999999999998 * sum(0.9 ** (d - 1) for d in range(1, 6)), 6
    )


def test_disjoint_rankings(spark):
    ra, rb = _runs(spark, ["a1", "a2", "a3"], ["b1", "b2", "b3"])
    r = C.rbo_overlap(ra, rb, p=0.9, depth=3).collect()[0]
    assert r["overlap_at_depth"] == 0 and r["rbo_at_depth"] == 0.0


@pytest.mark.parametrize("p,depth", [(0.9, 4), (0.5, 3)])
def test_partial_overlap_matches_reference(spark, p, depth):
    a = ["x", "y", "z", "w"]
    b = ["y", "x", "q", "z"]  # swapped top pair, one new, one shared deep
    ra, rb = _runs(spark, a, b)
    r = C.rbo_overlap(ra, rb, p=p, depth=depth).collect()[0]
    assert r["rbo_at_depth"] == round(_rbo_ref(a, b, p, depth), 6)
    assert r["overlap_at_depth"] == len(set(a[:depth]) & set(b[:depth]))


def test_query_in_one_run_only(spark):
    ra = spark.createDataFrame(
        [("q1", "d0", 1), ("q2", "d0", 1)], "qid string, doc_id string, rank long"
    )
    rb = spark.createDataFrame(
        [("q1", "d0", 1)], "qid string, doc_id string, rank long"
    )
    out = {r["qid"]: r for r in C.rbo_overlap(ra, rb, depth=2).collect()}
    assert set(out) == {"q1", "q2"}  # q2 appears with zero overlap
    assert out["q2"]["rbo_at_depth"] == 0.0
