"""Batch BM25 retrieval join (`corpus.bm25_batch_topk`) — parity with the
single-query scorer, query-tf semantics, stopword cap, and the broadcast
plan contract."""

import math

import pytest
from pyspark.sql import functions as F

from web_crawler_spark.operators import corpus as C

DOCS = [
    (1, "spark joins tables with hash partitions"),
    (2, "window functions rank rows inside spark partitions"),
    (3, "the cat sat on the mat"),
    (4, "hash hash hash collisions everywhere hash"),
    (5, "spark spark spark spark streaming"),
    (6, ""),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_single_query_batch_matches_bm25_topk(spark):
    """A 1-query batch with distinct query terms must reproduce
    bm25_topk's exact (doc_id, score) top-k — same idf form, same norm,
    same rounding — modulo the extra query_id/rank columns."""
    d = _docs(spark)
    single = C.bm25_topk(d, ["spark", "hash"], k=4).collect()
    q = spark.createDataFrame([(7, "spark hash")], "query_id int, query string")
    batch = C.bm25_batch_topk(d, q, k=4).orderBy("rank").collect()
    assert [(r["doc_id"], r["score"]) for r in batch] == [
        (r["doc_id"], r["score"]) for r in single
    ]
    assert [r["rank"] for r in batch] == list(range(1, len(batch) + 1))
    assert all(r["query_id"] == 7 for r in batch)


def test_query_tf_scales_contribution_linearly(spark):
    """A term repeated in the query enters with qtf = its count (the
    k3→infinity limit): 'spark spark' scores exactly 2x 'spark'."""
    d = _docs(spark)
    q = spark.createDataFrame(
        [(1, "spark"), (2, "spark spark")], "query_id int, query string"
    )
    rows = C.bm25_batch_topk(d, q, k=10).collect()
    s1 = {r["doc_id"]: r["score"] for r in rows if r["query_id"] == 1}
    s2 = {r["doc_id"]: r["score"] for r in rows if r["query_id"] == 2}
    assert set(s1) == set(s2)
    for doc, sc in s1.items():
        assert math.isclose(s2[doc], 2 * sc, abs_tol=2e-6)


def test_python_reference_parity(spark):
    """Full batch scores match an independent pure-Python BM25 computed
    from scratch (tokenize, df, idf, norm) for every (query, doc) pair."""
    k1, b = 1.2, 0.75
    toks = {i: t.lower().split() for i, t in DOCS}
    n = len(DOCS)
    dls = {i: len(t) for i, t in toks.items()}
    avgdl = sum(dls.values()) / n
    queries = [(1, "spark rank rows"), (2, "mat cat"), (3, "hash")]

    def score(qtext, d):
        s = 0.0
        for term in set(qtext.split()):
            qtf = qtext.split().count(term)
            tf = toks[d].count(term)
            if tf == 0:
                continue
            dfreq = sum(1 for t in toks.values() if term in t)
            idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
            s += qtf * idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[d] / avgdl))
        return round(s, 6)

    expected = {}
    for qid, qt in queries:
        scored = [(d, score(qt, d)) for d, _ in DOCS if score(qt, d) > 0]
        scored.sort(key=lambda x: (-x[1], x[0]))
        for rank, (d, sc) in enumerate(scored[:5], 1):
            expected[(qid, d)] = (sc, rank)

    q = spark.createDataFrame(queries, "query_id int, query string")
    got = {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"])
        for r in C.bm25_batch_topk(_docs(spark), q, k=5).collect()
    }
    assert got.keys() == expected.keys()
    for key in expected:
        assert math.isclose(got[key][0], expected[key][0], abs_tol=2e-6), key
        assert got[key][1] == expected[key][1], key


def test_max_df_drops_stopword_only_query(spark):
    """max_df prunes hot-term postings BEFORE the query join: a query made
    only of capped terms returns nothing; rarer-term queries unaffected."""
    d = _docs(spark)
    q = spark.createDataFrame(
        [(1, "spark"), (2, "mat")], "query_id int, query string"
    )
    rows = C.bm25_batch_topk(d, q, k=10, max_df=2).collect()
    assert not [r for r in rows if r["query_id"] == 1]  # spark: df=3 > 2
    assert [r["doc_id"] for r in rows if r["query_id"] == 2] == [3]


def test_plan_broadcasts_query_terms(spark):
    """The query-terms join must be a BroadcastHashJoin (corpus side never
    reshuffles for the query join); no cartesian anywhere."""
    d = _docs(spark)
    q = spark.createDataFrame([(1, "spark hash")], "query_id int, query string")
    plan = _plan(C.bm25_batch_topk(d, q, k=3))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_empty_corpus_and_empty_query_set(spark):
    d = _docs(spark).limit(0)
    q = spark.createDataFrame([(1, "spark")], "query_id int, query string")
    assert C.bm25_batch_topk(d, q, k=3).count() == 0
    q0 = q.limit(0)
    assert C.bm25_batch_topk(_docs(spark), q0, k=3).count() == 0
