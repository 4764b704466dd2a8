"""ngram_novelty (operators/corpus.py): seen-before share of distinct
word n-grams vs earlier documents — full copies, partial overlap,
short-doc NULL, ingestion-order direction."""

from web_crawler_spark.operators import corpus as CO


def _run(spark, rows, n=3):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: (r.n_grams, r.n_seen_before, r.novelty_milli)
        for r in CO.ngram_novelty(df, n=n).collect()
    }


def test_full_copy_and_partial_overlap(spark):
    rows = [
        (0, "a b c d e"),          # grams: abc bcd cde -> all novel
        (1, "a b c d e"),          # full copy -> novelty 0
        (2, "a b c x y"),          # grams: abc bcx cxy -> abc seen
        (3, "p q r"),              # one fresh gram
    ]
    got = _run(spark, rows)
    assert got == {
        0: (3, 0, 1000),
        1: (3, 3, 0),
        2: (3, 1, 666),
        3: (1, 0, 1000),
    }


def test_short_docs_null_and_repeated_gram_within_doc(spark):
    rows = [
        (0, "x y"),                # shorter than n -> no grams
        (1, "a b c a b c a b c"), # distinct grams only, all first here
    ]
    got = _run(spark, rows)
    assert got[0] == (0, 0, None)
    # tokens: a b c a b c a b c -> 7 windows, distinct: abc bca cab -> 3
    assert got[1] == (3, 0, 1000)


def test_direction_is_ingestion_order(spark):
    # the EARLIER doc keeps novelty even when a later doc copies it
    rows = [(10, "m n o p"), (5, "m n o p")]
    got = _run(spark, rows)
    assert got[5] == (2, 0, 1000)
    assert got[10] == (2, 2, 0)
