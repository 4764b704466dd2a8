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


# --- RM3 pseudo-relevance feedback ---------------------------------------

def test_rm3_matches_pure_python_reference(spark):
    got = {
        r["doc_id"]: r["score"]
        for r in C.rm3_topk(
            _docs(spark), ["spark", "hash"], k=10, fb_docs=3, fb_terms=4,
            orig_weight=0.5,
        ).collect()
    }
    # the weighted-BM25 final pass uses per-term idf weights: replay the
    # whole chain independently (plain idf-weighted first pass == bm25_topk
    # with unit weights would differ; the reference mirrors the engine's
    # actual first pass)
    first = {
        r["doc_id"]: r["score"]
        for r in C.bm25_topk(_docs(spark), ["spark", "hash"], k=3).collect()
    }
    # reference feedback set must match the engine's first pass
    ref = _rm3_reference_from_first(first, DOCS, ["spark", "hash"], 4, 0.5)
    assert set(got) == set(ref)
    for d in got:
        assert got[d] == pytest.approx(ref[d], abs=2e-6), d


def _rm3_reference_from_first(first, docs, query_terms, fb_terms, alpha,
                              k1=1.2, b=0.75):
    def toks(t):
        return t.strip().lower().split() if t.strip() else []

    fb = sorted(first.items())
    total = 0.0
    for _, s in fb:
        total += s
    w_doc = {d: s / total for d, s in fb}
    prel = {}
    for d, t in docs:
        if d not in w_doc:
            continue
        tk = toks(t)
        for term in set(tk):
            prel.setdefault(term, []).append(
                (d, tk.count(term) / len(tk) * w_doc[d])
            )
    p = {}
    for term, cs in prel.items():
        acc = 0.0
        for _, c in sorted(cs):
            acc += c
        p[term] = acc
    top = sorted(p.items(), key=lambda kv: (-kv[1], kv[0]))[:fb_terms]
    weights = {}
    for t in sorted(set(query_terms)):
        weights[t] = alpha * query_terms.count(t) / len(query_terms)
    for t, pv in top:
        weights[t] = weights.get(t, 0.0) + (1.0 - alpha) * pv

    dls = {d: len(toks(t)) for d, t in docs}
    n = len(docs)
    avgdl = sum(dls.values()) / n
    out = {}
    for d, t in docs:
        tk = toks(t)
        s = 0.0
        for term in sorted(weights):
            tf = tk.count(term)
            df = sum(1 for _, tt in docs if term in toks(tt))
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += (weights[term] * idf * tf * (k1 + 1.0)
                  / (tf + k1 * (1.0 - b + b * dls[d] / avgdl)))
        if s > 0:
            out[d] = round(s, 6)
    return out


def test_rm3_expansion_pulls_in_cooccurring_terms(spark):
    # 'partitions' co-occurs with 'spark' in docs 1 and 2 -> RM3 should
    # surface doc 2 (no 'hash', but feedback-vocabulary rich) above the
    # pure-repetition doc 4 for query ['hash'] once expansion kicks in.
    out = C.rm3_topk(
        _docs(spark), ["spark"], k=10, fb_docs=2, fb_terms=8,
        orig_weight=0.3,
    ).collect()
    ids = [r["doc_id"] for r in out]
    assert 1 in ids and 2 in ids  # expansion recalls both spark docs
    assert 3 not in ids  # unrelated doc stays out


def test_rm3_no_feedback_degrades_to_bm25(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    got = C.rm3_topk(docs, ["zzz"], k=5).collect()
    assert got == C.bm25_topk(docs, ["zzz"], k=5).collect()


def test_rm3_empty_query_is_empty(spark):
    assert C.rm3_topk(_docs(spark), [], k=5).count() == 0


def test_weighted_bm25_unit_weights_match_bm25(spark):
    w = {t: 1.0 for t in ["spark", "hash"]}
    a = C.bm25_weighted_topk(_docs(spark), w, k=10).collect()
    bq = C.bm25_topk(_docs(spark), ["hash", "spark"], k=10).collect()
    assert {r["doc_id"]: r["score"] for r in a} == {
        r["doc_id"]: r["score"] for r in bq
    }


# --- retrieval_eval (trec_eval metric set) ---------------------------------

def test_retrieval_eval_hand_computed(spark):
    run = spark.createDataFrame(
        [(1, d, float(100 - d)) for d in range(1, 6)],
        "query_id long, doc_id long, score double",
    )
    # relevant: rank1 (rel 2), rank3 (rel 1), plus one unretrieved (rel 3)
    qrels = spark.createDataFrame(
        [(1, 1, 2), (1, 3, 1), (1, 99, 3)],
        "query_id long, doc_id long, rel int",
    )
    r = C.retrieval_eval(run, qrels, k=10).collect()[0]
    assert r["n_rel"] == 3
    assert r["mrr"] == 1.0
    # AP = (P@1 + P@3)/n_rel = (1/1 + 2/3)/3
    assert r["ap"] == pytest.approx((1.0 + 2.0 / 3.0) / 3.0, abs=1e-6)
    # DCG = (2^2-1)/log2(2) + (2^1-1)/log2(4) = 3 + 0.5
    assert r["dcg_at_k"] == pytest.approx(3.5, abs=1e-6)
    # IDCG = ideal rels [3,2,1] -> 7/1 + 3/log2(3) + 1/2
    idcg = 7.0 + 3.0 / math.log2(3.0) + 0.5
    assert r["ndcg_at_k"] == pytest.approx(3.5 / idcg, abs=1e-6)
    assert r["p_at_k"] == pytest.approx(0.2, abs=1e-6)
    assert r["recall_at_k"] == pytest.approx(2.0 / 3.0, abs=1e-6)


def test_retrieval_eval_no_relevant_is_null_not_zero(spark):
    run = spark.createDataFrame(
        [(7, 1, 5.0), (7, 2, 4.0)], "query_id long, doc_id long, score double"
    )
    qrels = spark.createDataFrame(
        [(7, 1, 0)], "query_id long, doc_id long, rel int"
    )
    r = C.retrieval_eval(run, qrels, k=10).collect()[0]
    assert r["n_rel"] == 0 and r["mrr"] == 0.0
    assert r["ap"] is None and r["ndcg_at_k"] is None
    assert r["recall_at_k"] is None


def test_retrieval_eval_tie_break_and_cutoff(spark):
    # two docs tie on score: doc_id asc wins rank 1
    run = spark.createDataFrame(
        [(3, 11, 9.0), (3, 10, 9.0)] +
        [(3, 20 + i, 1.0 - i * 0.01) for i in range(10)],
        "query_id long, doc_id long, score double",
    )
    qrels = spark.createDataFrame(
        [(3, 10, 1), (3, 29, 1)], "query_id long, doc_id long, rel int"
    )
    r = C.retrieval_eval(run, qrels, k=10).collect()[0]
    assert r["mrr"] == 1.0  # doc 10 at rank 1 by tie-break
    # doc 29 lands at rank 12 > k: contributes to AP, not to P@k/DCG
    assert r["p_at_k"] == pytest.approx(0.1, abs=1e-6)
    assert r["ap"] == pytest.approx((1.0 + 2.0 / 12.0) / 2.0, abs=1e-6)
    assert r["dcg_at_k"] == pytest.approx(1.0, abs=1e-6)  # rel1 at rank1


# --- BM25F field-weighted retrieval ---------------------------------------

def _bm25f_ref(docs, terms, fields, k1=1.2):
    """Pure-Python BM25F mirror (field order, then sorted-term order)."""
    def toks(t):
        return t.strip().lower().split() if t and t.strip() else []

    n = len(docs)
    dls = {f: {d[0]: len(toks(d[i + 1])) for d in docs}
           for i, f in enumerate(fields)}
    avg = {f: (sum(dls[f].values()) / n) or 1.0 for f in fields}
    out = {}
    for d in docs:
        did = d[0]
        score = 0.0
        for term in terms:
            df = sum(
                1 for dd in docs
                if any(term in toks(dd[i + 1]) for i in range(len(fields)))
            )
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            tft = 0.0
            for i, (f, (w, bf)) in enumerate(fields.items()):
                tf = toks(d[i + 1]).count(term)
                tft += w * tf / (1.0 - bf + bf * dls[f][did] / avg[f])
            score += idf * tft / (k1 + tft)
        if score > 0:
            out[did] = round(score, 6)
    return out


def test_bm25f_matches_pure_python(spark):
    docs = [
        (1, "spark joins tables", "spark homepage"),
        (2, "window functions everywhere", ""),
        (3, "the cat sat", "spark spark spark"),
        (4, "spark spark spark spark", "unrelated"),
    ]
    fields = {"text": (1.0, 0.75), "anchor": (2.5, 0.6)}
    df = spark.createDataFrame(
        docs, "doc_id long, text string, anchor string"
    )
    got = {
        r["doc_id"]: r["score"]
        for r in C.bm25f_topk(df, ["spark"], fields=fields).collect()
    }
    ref = _bm25f_ref(docs, ["spark"], fields)
    assert got == {d: pytest.approx(s, abs=2e-6) for d, s in ref.items()}


def test_bm25f_anchor_weight_reorders_body_ranking(spark):
    # doc 3 has zero body hits but heavy anchor evidence: with w_anchor=2.5
    # it must outrank doc 1 (one body + one anchor hit)
    docs = [
        (1, "spark joins tables", "spark homepage"),
        (3, "the cat sat", "spark spark spark"),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, anchor string"
    )
    out = C.bm25f_topk(df, ["spark"]).collect()
    assert [r["doc_id"] for r in out] == [3, 1]
    # saturation applies to COMBINED evidence: the two scores stay within
    # one idf of each other (naive per-field BM25 would double-count)
    assert out[0]["score"] < 2 * out[1]["score"]


def test_bm25f_null_field_counts_as_empty(spark):
    df = spark.createDataFrame(
        [(1, "spark docs", None), (2, "nothing here", "spark")],
        "doc_id long, text string, anchor string",
    )
    out = C.bm25f_topk(df, ["spark"]).collect()
    assert {r["doc_id"] for r in out} == {1, 2}


def test_bm25f_all_empty_anchor_field_no_nan(spark):
    df = spark.createDataFrame(
        [(1, "spark docs", ""), (2, "spark spark", "")],
        "doc_id long, text string, anchor string",
    )
    out = C.bm25f_topk(df, ["spark"]).collect()
    assert len(out) == 2 and all(r["score"] > 0 for r in out)


def _ql_python(rows, terms, mu):
    import math

    toks = {d: t.lower().split() for d, t in rows}
    total = sum(len(t) for t in toks.values())
    cf = {q: sum(t.count(q) for t in toks.values()) for q in terms}
    live = [q for q in terms if cf[q] > 0]
    out = {}
    for d, t in toks.items():
        s = 0.0
        for q in live:
            s += math.log((t.count(q) + mu * (cf[q] / total)) / (len(t) + mu))
        out[d] = round(s, 6)
    return out, live


def test_ql_dirichlet_matches_pure_python(spark):
    from web_crawler_spark.operators.corpus import ql_dirichlet_topk

    rows = [
        ("d1", "spark window join spark spark"),
        ("d2", "window join filter " + "pad " * 30),
        ("d3", "spark " + "x " * 5),
        ("d4", "totally unrelated text here"),
    ]
    terms = ["spark", "window", "neverseen"]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["score"] for r in
           ql_dirichlet_topk(docs, terms, k=10, mu=50.0).collect()}
    want, live = _ql_python(rows, terms, 50.0)
    assert live == ["spark", "window"]  # OOV dropped
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) <= 1e-6


def test_ql_dirichlet_smoothing_and_verbosity(spark):
    from web_crawler_spark.operators.corpus import ql_dirichlet_topk

    rows = [
        ("hit_both", "spark window alpha beta"),
        ("hit_one", "spark alpha beta gamma"),       # missing 'window'
        ("short_miss", "alpha beta"),
        ("long_miss", "alpha beta " + "gamma delta " * 40),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [r["doc_id"] for r in
           ql_dirichlet_topk(docs, ["spark", "window"], k=10, mu=100.0).collect()]
    # smoothing: the doc missing one term still scores and outranks docs
    # missing both (the Zhai-Lafferty point vs unsmoothed MLE's -inf)
    assert got.index("hit_both") < got.index("hit_one") < got.index("short_miss")
    # Dirichlet length behavior: among term-free docs the verbose one
    # loses (dl sits in the denominator)
    assert got.index("short_miss") < got.index("long_miss")
    assert len(got) == 4  # every doc scores under QL, unlike BM25


def test_ql_dirichlet_edges(spark):
    from web_crawler_spark.operators.corpus import ql_dirichlet_topk

    docs = spark.createDataFrame(
        [("d1", "alpha beta")], ["doc_id", "text"]
    )
    assert ql_dirichlet_topk(docs, [], k=5).count() == 0
    # every term collection-OOV -> empty (no scorable evidence), not ln(0)
    assert ql_dirichlet_topk(docs, ["zz", "qq"], k=5).count() == 0
    empty = spark.createDataFrame([], "doc_id string, text string")
    assert ql_dirichlet_topk(empty, ["alpha"], k=5).count() == 0
