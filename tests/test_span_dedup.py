"""remove_duplicate_spans (operators/corpus.py): overlapping-window exact
substring dedup (Lee et al. 2021 semantics). Toy corpus with 3-word windows
so duplicate windows and merged spans are enumerable by hand."""

from web_crawler_spark.operators import corpus as C


def _rows(df):
    return {r.doc_id: (r.clean_text, r.n_tokens, r.n_removed) for r in df.collect()}


def test_later_instance_cut_first_kept(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),        # windows abc bcd cde — all globally first
            (2, "x a b c d y"),      # abc+bcd dup -> positions 1..4 cut
            (3, "short doc"),        # < window_words: never touched
            (4, ""),                 # empty preserved
        ],
        ["doc_id", "text"],
    )
    out = _rows(C.remove_duplicate_spans(docs, window_words=3))
    assert out[1] == ("a b c d e", 5, 0)
    assert out[2] == ("x y", 6, 4)
    assert out[3] == ("short doc", 2, 0)
    assert out[4] == ("", 0, 0)


def test_offset_shift_still_caught(spark):
    # remove_duplicate_chunks at chunk_words=3 would MISS this (chunks
    # "p a b" / "c d q" never align with doc 1's "a b c" / "d e f");
    # overlapping windows catch the span at any offset.
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "p a b c d q")],
        ["doc_id", "text"],
    )
    out = _rows(C.remove_duplicate_spans(docs, window_words=3))
    assert out[1] == ("a b c d e f", 6, 0)
    assert out[2] == ("p q", 6, 4)      # a b c d cut as one merged span


def test_full_duplicate_doc_empties(spark):
    docs = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5"), (2, "w1 w2 w3 w4 w5")],
        ["doc_id", "text"],
    )
    out = _rows(C.remove_duplicate_spans(docs, window_words=3))
    assert out[1] == ("w1 w2 w3 w4 w5", 5, 0)
    assert out[2] == ("", 5, 5)


def test_self_repetition_within_doc(spark):
    docs = spark.createDataFrame([(1, "r s t u r s t v")], ["doc_id", "text"])
    out = _rows(C.remove_duplicate_spans(docs, window_words=3))
    # second "r s t" (positions 4..6) duplicates window 0 -> cut
    assert out[1] == ("r s t u v", 8, 3)


def test_overlapping_spans_merge_not_double_count(spark):
    # doc 2 repeats a 5-token span: windows at gpos 1,2,3 all dup; the
    # covered positions 1..5 must count once each (distinct), not 9.
    docs = spark.createDataFrame(
        [(1, "m n o p q"), (2, "z m n o p q z2")],
        ["doc_id", "text"],
    )
    out = _rows(C.remove_duplicate_spans(docs, window_words=3))
    assert out[2] == ("z z2", 7, 5)


def _ref_span_dedup(docs, w):
    """Plain-Python reference of the operator's exact semantics."""
    toks = {d: (t.split() if t.strip() else []) for d, t in docs}
    occ = {}
    for d in sorted(toks):
        t = toks[d]
        for i in range(len(t) - w + 1):
            occ.setdefault(tuple(t[i:i + w]), []).append((d, i))
    removed = {d: set() for d in toks}
    for lst in occ.values():
        for d, i in sorted(lst)[1:]:
            removed[d].update(range(i, i + w))
    return {d: (" ".join(tok for j, tok in enumerate(t) if j not in removed[d]),
                len(t), len(removed[d]))
            for d, t in toks.items()}


def test_differential_vs_reference_on_random_corpora(spark):
    # 30 independent random corpora batched into ONE Spark job: tokens
    # are corpus-prefixed, so no w-gram ever collides across corpora and
    # the batch is exactly equivalent to 30 separate runs.
    import random

    rng = random.Random(20260818)
    rows, expect = [], {}
    for cid in range(30):
        vocab = [f"c{cid}w{k}" for k in range(6)]   # tiny vocab: dense dups
        docs = []
        for di in range(rng.randint(2, 6)):
            n = rng.randint(0, 25)
            docs.append((cid * 100 + di,
                         " ".join(rng.choice(vocab) for _ in range(n))))
        for d, (ct, nt, nr) in _ref_span_dedup(docs, 3).items():
            expect[d] = (ct, nt, nr)
        rows.extend(docs)
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from web_crawler_spark.operators import corpus as C
    got = {r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
           for r in C.remove_duplicate_spans(df, window_words=3).collect()}
    assert got == expect
