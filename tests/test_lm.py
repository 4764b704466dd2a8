"""n-gram LM perplexity scoring (operators/lm) — Spark vs a pure-Python
reference implementation of the same add-alpha bigram estimator, plus the
smoothing/empty-doc/filter edges."""

import math
import re

from web_crawler_spark.operators.lm import (
    LP_SCALE,
    perplexity_filter,
    score_docs,
    train_bigram_lm,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "the cat ate the dog"),
    (3, "Quantum flux capacitors!"),  # mostly-unseen scoring path
    (4, ""),                          # empty doc -> single (<s>, </s>) bigram
]
TRAIN_IDS = {0, 1, 2}


def _py_tokens(text):
    return ["<s>"] + re.findall(r"[a-z0-9]+", text.lower()) + ["</s>"]


def _py_model():
    cnt, ctx, types = {}, {}, set()
    for i, t in DOCS:
        if i not in TRAIN_IDS:
            continue
        w = _py_tokens(t)
        for a, b in zip(w, w[1:]):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
            types.update((a, b))
    return cnt, ctx, len(types) + 1


def _py_score(text, cnt, ctx, v, alpha=1.0):
    w = _py_tokens(text)
    lps = [
        math.floor(
            math.log(
                (cnt.get((a, b), 0) + alpha) / (ctx.get(a, 0) + alpha * v)
            )
            * LP_SCALE
        )
        for a, b in zip(w, w[1:])
    ]
    return len(lps), sum(lps)


def _spark_scored(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    train = df.filter(df.doc_id.isin(list(TRAIN_IDS)))
    bigrams, contexts, v = train_bigram_lm(train)
    return score_docs(df, bigrams, contexts, v), v


def test_matches_python_reference(spark):
    scored, v = _spark_scored(spark)
    cnt, ctx, v_py = _py_model()
    assert v == v_py
    got = {r["doc_id"]: r for r in scored.collect()}
    for i, t in DOCS:
        n, lp = _py_score(t, cnt, ctx, v_py)
        assert (got[i]["n_bigrams"], got[i]["logprob_fp"]) == (n, lp), i
        assert got[i]["avg_logprob"] == lp / (n * LP_SCALE)
        assert abs(
            got[i]["perplexity"] - math.exp(-lp / (n * LP_SCALE))
        ) < 1e-9


def test_in_domain_beats_out_of_domain(spark):
    scored, _ = _spark_scored(spark)
    got = {r["doc_id"]: r["perplexity"] for r in scored.collect()}
    assert got[0] < got[3]  # training doc far more predictable than OOV doc


def test_empty_doc_scores_one_bigram(spark):
    scored, _ = _spark_scored(spark)
    row = scored.filter("doc_id = 4").collect()[0]
    assert row["n_bigrams"] == 1


def test_perplexity_filter(spark):
    scored, _ = _spark_scored(spark)
    vals = sorted(r["perplexity"] for r in scored.collect())
    cut = (vals[2] + vals[3]) / 2
    kept = perplexity_filter(scored, cut)
    assert kept.count() == 3
