"""Interpolated Kneser-Ney bigram LM (operators/lm.py): pure-Python
parity, the continuation ("francisco") effect, OOV context backoff, and
fixed-point determinism."""

import math

import pytest

from web_crawler_spark.operators import lm as L

TRAIN = [
    (0, "san francisco is foggy"),
    (1, "san francisco is big"),
    (2, "new york is big"),
    (3, "the city is big"),
]


def _py_kn(train_texts, score_text, d=0.75):
    def toks(t):
        import re
        return ["<s>"] + re.findall("[a-z0-9]+", t.lower()) + ["</s>"]

    pairs = {}
    for t in train_texts:
        w = toks(t)
        for a, b in zip(w, w[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    ctx_c, n_succ, n_prec = {}, {}, {}
    for (a, b), c in pairs.items():
        ctx_c[a] = ctx_c.get(a, 0) + c
        n_succ[a] = n_succ.get(a, 0) + 1
        n_prec[b] = n_prec.get(b, 0) + 1
    nbt = len(pairs)
    vocab = {a for a, _ in pairs} | {b for _, b in pairs}
    v = len(vocab) + 1

    def pc(w):
        return (n_prec.get(w, 0) + 1) / float(nbt + v)

    def p(a, b):
        if ctx_c.get(a, 0) > 0:
            return (
                max(pairs.get((a, b), 0) - d, 0.0)
                + d * n_succ.get(a, 0) * pc(b)
            ) / ctx_c[a]
        return pc(b)

    w = toks(score_text)
    lp = sum(
        math.floor(math.log(p(a, b)) * 1_000_000) for a, b in zip(w, w[1:])
    )
    return lp, len(w) - 1


def _score(spark, score_rows):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    docs = spark.createDataFrame(score_rows, "doc_id long, text string")
    pairs, ctx, cont, nbt, v = L.train_kn_lm(train)
    return {
        r["doc_id"]: r
        for r in L.kn_score_docs(docs, pairs, ctx, cont, nbt, v).collect()
    }


def test_pure_python_parity_including_oov(spark):
    score_rows = [
        (10, "san francisco is big"),        # all seen
        (11, "francisco is new"),             # unseen pair (is, new)
        (12, "quantum flux is big"),          # OOV words + OOV context
    ]
    out = _score(spark, score_rows)
    texts = [t for _, t in TRAIN]
    for did, text in score_rows:
        lp, n = _py_kn(texts, text)
        assert out[did]["logprob_fp"] == lp, text
        assert out[did]["n_bigrams"] == n
        assert out[did]["avg_logprob"] == pytest.approx(
            lp / (n * 1e6), abs=1e-12
        )


def test_continuation_effect(spark):
    # "francisco" occurs twice but only ever after "san"; "big" occurs
    # 3x after 3 different contexts -> Pc(big) > Pc(francisco), so an
    # OOV context prefers "big" despite equal-ish raw frequency
    out = _score(spark, [(20, "zzz francisco"), (21, "zzz big")])
    assert out[21]["logprob_fp"] > out[20]["logprob_fp"]


def test_perplexity_orders_fluency(spark):
    out = _score(spark, [(30, "san francisco is big"),
                         (31, "big is francisco san")])
    assert out[30]["perplexity"] < out[31]["perplexity"]
