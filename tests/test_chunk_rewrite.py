"""remove_duplicate_chunks (operators/corpus.py): sub-document dedup that
rewrites documents. Toy corpus with 2-word chunks so instances are easy to
enumerate by hand."""

from web_crawler_spark.operators import corpus as C


def _rows(df):
    return {r.doc_id: (r.clean_text, r.n_chunks, r.n_removed) for r in df.collect()}


def test_keep_first_cuts_later_instances_only(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # chunks: "a b", "c d" — both first
            (2, "a b x y"),          # "a b" dup (cut), "x y" first
            (3, "a b c d"),          # fully recycled -> ''
            (4, ""),                 # empty text preserved
        ],
        ["doc_id", "text"],
    )
    out = _rows(C.remove_duplicate_chunks(docs, chunk_words=2))
    assert out[1] == ("a b c d", 2, 0)
    assert out[2] == ("x y", 2, 1)
    assert out[3] == ("", 2, 2)
    assert out[4] == ("", 0, 0)


def test_drop_common_kills_boilerplate_everywhere(spark):
    docs = spark.createDataFrame(
        [(i, f"nav bar u{i} v{i}") for i in range(1, 5)],  # "nav bar" df=4
        ["doc_id", "text"],
    )
    out = _rows(C.remove_duplicate_chunks(docs, chunk_words=2, policy="drop_common", max_df=1))
    # the boilerplate chunk is cut from EVERY doc, including the first
    assert all(out[i] == (f"u{i} v{i}", 2, 1) for i in range(1, 5))


def test_odd_length_partial_last_chunk(spark):
    docs = spark.createDataFrame([(1, "a b c"), (2, "p q c")], ["doc_id", "text"])
    out = _rows(C.remove_duplicate_chunks(docs, chunk_words=2))
    # partial last chunks ("c") dedup like any chunk: doc 2 loses its "c"
    assert out[1] == ("a b c", 2, 0)
    assert out[2] == ("p q", 2, 1)
