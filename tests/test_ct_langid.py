"""Cavnar-Trenkle n-gram langid (corpus.py): correct classification on
separable languages, out-of-place arithmetic, no-match NULL, k-penalty
dominance invariant."""

from web_crawler_spark.operators import corpus as C

TRAIN = [
    ("en", "the quick brown fox and the lazy dog keep the pace"),
    ("en", "this is the house that jack built with the red door"),
    ("de", "der schnelle braune fuchs und der faule hund laufen"),
    ("de", "das ist das haus das jakob mit der roten tuer baute"),
]


def _classify(spark, docs, k=20):
    tr = spark.createDataFrame(TRAIN, "lang string, text string")
    d = spark.createDataFrame(docs, "doc_id long, text string")
    prof = C.cavnar_trenkle_profiles(tr, k=k)
    return {
        r["doc_id"]: r
        for r in C.cavnar_trenkle_classify(d, prof, k=k).collect()
    }


def test_separable_languages(spark):
    out = _classify(spark, [
        (1, "the fox and the dog in the house"),
        (2, "der fuchs und der hund in dem haus"),
    ])
    assert out[1]["predicted_lang"] == "en"
    assert out[2]["predicted_lang"] == "de"
    assert out[1]["best_dist"] < out[2]["best_dist"] + 10_000  # sanity


def test_no_match_is_null(spark):
    out = _classify(spark, [(3, "0123456789 0123456789")])
    assert out[3]["predicted_lang"] is None
    assert out[3]["best_dist"] is None


def test_matched_language_always_beats_unmatched(spark):
    # construct a doc sharing exactly one gram with en and none with de
    out = _classify(spark, [(4, "qqqthexxx")])
    assert out[4]["predicted_lang"] == "en"


def test_exact_profile_scores_zero_ish(spark):
    # a doc that IS a training text ranks its grams nearly identically
    out = _classify(spark, [(5, TRAIN[0][1])])
    assert out[5]["predicted_lang"] == "en"
    out2 = _classify(spark, [(6, "completely different words entirely")])
    if out2[6]["predicted_lang"] is not None:
        assert out[5]["best_dist"] <= out2[6]["best_dist"]
