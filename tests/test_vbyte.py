"""postings_vbyte_size: delta-gap + varint index sizing (corpus.py) —
hand-computed byte counts at the 2^7k boundaries, first-gap convention,
min_df filter, duplicate-token collapse."""

from web_crawler_spark.operators import corpus as C


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _row(out, term):
    return {r["term"]: r for r in out}[term]


def test_hand_computed_gaps_and_bytes(spark):
    # term 'a' in docs 0, 127, 255: gaps = 1 (=0-(-1)), 127, 128
    # bytes = 1 + 1 + 2 = 4
    rows = [(0, "a"), (127, "a"), (255, "a")]
    out = C.postings_vbyte_size(_df(spark, rows)).collect()
    r = _row(out, "a")
    assert r["df_docs"] == 3
    assert r["raw_bytes"] == 24
    assert r["vbyte_bytes"] == 4
    assert r["ratio_milli"] == 1000 * 4 // 24


def test_boundary_thresholds(spark):
    # single doc at id 16383: first gap = 16384 -> 3 bytes (>=128, >=16384)
    out = C.postings_vbyte_size(_df(spark, [(16383, "b")])).collect()
    r = _row(out, "b")
    assert r["df_docs"] == 1 and r["vbyte_bytes"] == 3
    # id 16382: gap 16383 -> 2 bytes
    out = C.postings_vbyte_size(_df(spark, [(16382, "b")])).collect()
    assert _row(out, "b")["vbyte_bytes"] == 2


def test_dense_postings_compress_densest(spark):
    # 'the' in every doc 0..9 (all gaps 1): 10 one-byte gaps
    rows = [(i, "the rare" + str(i)) for i in range(10)]
    out = C.postings_vbyte_size(_df(spark, rows)).collect()
    r = _row(out, "the")
    assert r["vbyte_bytes"] == 10 and r["ratio_milli"] == 125


def test_min_df_and_duplicate_tokens(spark):
    # repeated token in one doc collapses to a single posting
    rows = [(5, "x x x"), (6, "x"), (7, "y")]
    out = C.postings_vbyte_size(_df(spark, rows), min_df=2).collect()
    assert [r["term"] for r in out] == ["x"]
    assert _row(out, "x")["df_docs"] == 2
