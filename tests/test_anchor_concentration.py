"""anchor_entropy (anchor-spam diversity signal), concentration_stats
(HHI / top-share / effective keys) and host_lang_outliers (source-majority
language coherence) — closed-form entropies, exact fixed-point values,
normalization collapse, deterministic majority tie-break."""

import math

from web_crawler_spark.operators.aggregate import concentration_stats
from web_crawler_spark.operators.corpus import host_lang_outliers
from web_crawler_spark.operators.graph import anchor_entropy


def _anchors(spark, rows):
    return spark.createDataFrame(
        list(rows), "to_url string, anchor_text string"
    )


def test_anchor_entropy_closed_forms(spark):
    rows = (
        [("u_spam", "Click Here")] * 8
        + [("u_mix", "a"), ("u_mix", "a"), ("u_mix", "b"), ("u_mix", "c")]
        + [("u_drop", ""), ("u_drop", None), ("u_drop", "only")]
    )
    got = {r["url"]: r for r in anchor_entropy(_anchors(spark, rows)).collect()}
    spam = got["u_spam"]
    assert (spam["n_inlinks"], spam["n_unique_anchors"]) == (8, 1)
    assert spam["anchor_entropy_bits"] == 0.0  # -1*log2(1), the spam flag
    mix = got["u_mix"]  # p = (1/2, 1/4, 1/4) -> H = 1.5 bits
    assert (mix["n_inlinks"], mix["n_unique_anchors"]) == (4, 3)
    assert mix["anchor_entropy_bits"] == 1.5
    drop = got["u_drop"]  # empty + NULL anchors gone
    assert (drop["n_inlinks"], drop["n_unique_anchors"]) == (1, 1)


def test_anchor_entropy_normalization_collapses(spark):
    rows = [("u", " Click Here "), ("u", "click here"), ("u", "CLICK  HERE")]
    got = anchor_entropy(_anchors(spark, rows)).collect()[0]
    # trim+lower collapses the first two; the double-space form stays apart
    assert got["n_unique_anchors"] == 2
    p = [2 / 3, 1 / 3]
    ref = -sum(x * math.log(x) / math.log(2) for x in p)
    assert abs(got["anchor_entropy_bits"] - round(ref, 6)) <= 1e-6


def _keyed(spark, counts):
    rows = []
    for k, n in counts.items():
        rows += [(k, i) for i in range(n)]
    return spark.createDataFrame(rows, "host string, x long")


def test_concentration_uniform_and_monopoly(spark):
    u = concentration_stats(_keyed(spark, {"a": 5, "b": 5, "c": 5, "d": 5})).collect()[0]
    assert (u["n_keys"], u["n_rows"], u["top_share_milli"]) == (4, 20, 250)
    assert u["hhi_nano"] == 250_000_000  # 4 * (1/4)^2
    assert u["effective_keys_milli"] == 4000
    m = concentration_stats(_keyed(spark, {"a": 97, "b": 2, "c": 1})).collect()[0]
    assert m["top_share_milli"] == 970
    s2 = 97 * 97 + 4 + 1
    assert m["hhi_nano"] == math.floor(1e9 * s2 / 100 / 100)
    assert m["effective_keys_milli"] == math.floor(1000.0 * (100 * 100) / s2)


def _docs(spark, rows):
    return spark.createDataFrame(
        list(rows), "doc_id long, source string, text string"
    )


def test_host_lang_outliers_flags_minority(spark):
    en = "the quick brown fox and the lazy dog with all of this"
    de = "der schnelle braune fuchs und der faule hund mit und das"
    rows = [(i, "newsde", de) for i in range(5)] + [(10, "newsde", en)]
    rows += [(20, "blog", en), (21, "blog", en)]
    got = host_lang_outliers(_docs(spark, rows)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["doc_id"] == 10 and r["group"] == "newsde"
    assert r["predicted_lang"] == "en" and r["majority_lang"] == "de"
    assert (r["group_docs"], r["majority_docs"]) == (6, 5)


def test_host_lang_outliers_tie_breaks_deterministically(spark):
    en = "the and of to in that it was for with"
    de = "der die und das ist nicht ein zu mit den"
    # exact 1-1 tie: majority = lexicographically-first lang ('de'),
    # so the en doc is the outlier — never the other way round
    got = host_lang_outliers(_docs(spark, [(1, "s", en), (2, "s", de)])).collect()
    assert len(got) == 1 and got[0]["doc_id"] == 1
    assert got[0]["majority_lang"] == "de"


def test_tokenizer_fertility_hand_computed(spark):
    from web_crawler_spark.operators.corpus import tokenizer_fertility

    rows = [
        (1, "en", "hello world"),          # 2 words, 2 bpe tokens, 11 chars
        (2, "en", "don't stop"),           # 2 words, 4 bpe (don, ', t, stop)
        (3, "zz", "   "),                  # whitespace-only: 0 words, 0 tokens
    ]
    d = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r["lang"]: r for r in tokenizer_fertility(d).collect()}
    en = got["en"]
    assert (en["n_docs"], en["n_words"], en["n_tokens"]) == (2, 4, 6)
    assert en["n_chars"] == 11 + 10
    assert en["fertility_milli"] == 1000 * 6 // 4  # 1500
    assert en["chars_per_token_milli"] == 1000 * 21 // 6  # 3500
    zz = got["zz"]
    assert zz["fertility_milli"] is None and zz["chars_per_token_milli"] is None
