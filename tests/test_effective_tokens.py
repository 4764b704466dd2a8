"""effective_tokens (operators/corpus.py): dedup-aware per-source token
accounting — canonical credit goes to the min-id copy, duplicate tax is
integer fixed-point, normalization-equivalent texts share a cluster."""

from web_crawler_spark.operators import corpus as CO


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    return {
        r.source: (
            r.n_docs, r.n_canonical_docs, r.raw_tokens,
            r.effective_tokens, r.dup_token_share_milli,
        )
        for r in CO.effective_tokens(df).collect()
    }


def test_cross_source_duplicate_tax(spark):
    rows = [
        (0, "a", "alpha beta gamma"),        # canonical (3 tokens)
        (1, "b", "alpha beta gamma"),        # dup, tax on b
        (2, "a", "delta epsilon"),           # unique (2 tokens)
        (3, "b", "zeta"),                    # unique (1 token)
    ]
    got = _run(spark, rows)
    assert got == {
        "a": (2, 2, 5, 5, 0),
        "b": (2, 1, 4, 1, 750),              # floor(1000*3/4)
    }


def test_normalization_equivalent_texts_cluster(spark):
    rows = [
        (10, "x", "Hello,   World!"),        # canonical after normalization
        (11, "x", "hello world"),
    ]
    got = _run(spark, rows)
    assert got == {"x": (2, 1, 4, 2, 500)}


def test_canonical_is_min_id_within_same_source(spark):
    rows = [(5, "s", "a b"), (2, "s", "a b"), (9, "s", "c")]
    got = _run(spark, rows)
    # id 2 is canonical, ids 5 dup; raw 5 tokens, effective 3
    assert got == {"s": (3, 2, 5, 3, 400)}


def test_empty_text_source(spark):
    rows = [(0, "e", "   "), (1, "e", "")]
    got = _run(spark, rows)
    # both normalize to the same empty fingerprint: one canonical, 0 tokens
    assert got == {"e": (2, 1, 0, 0, 0)}
