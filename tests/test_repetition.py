"""Gopher repetition family (Rae et al. 2021): n-gram + duplicate-line."""
from pyspark.sql import functions as F

from web_crawler_spark.operators.corpus import (
    duplicate_line_stats,
    ngram_repetition,
)


def test_ngram_repetition_exact_fractions(spark):
    # "ab ab ab cd" -> bigrams: "ab ab" x2, "ab cd" x1
    df = spark.createDataFrame([(1, "ab ab ab cd")], "doc_id long, text string")
    r = ngram_repetition(df, n=2).collect()[0]
    assert r["top_ngram"] == "ab ab"
    # doc_chars=11; top: 2 occurrences x len("ab ab")=5 -> 10/11
    assert abs(r["top_ngram_char_frac"] - 10 / 11) < 1e-12
    assert abs(r["dup_ngram_char_frac"] - 10 / 11) < 1e-12


def test_ngram_tie_breaks_lexicographically_and_short_docs_drop(spark):
    df = spark.createDataFrame(
        [(1, "b a b a"),   # "b a" x2... bigrams: "b a","a b","b a" -> top "b a"
         (2, "solo")],     # < n tokens -> no row
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in ngram_repetition(df, n=2).collect()}
    assert set(rows) == {1}
    assert rows[1]["top_ngram"] == "b a"


def test_duplicate_line_stats(spark):
    text = "keep me\ndup line\ndup line\n   \nunique tail"
    df = spark.createDataFrame([(1, text), (2, "\n  \n")],
                               "doc_id long, text string")
    rows = {r["doc_id"]: r for r in duplicate_line_stats(df).collect()}
    # doc 2 has no non-blank lines -> no row (documented contract)
    assert set(rows) == {1}
    r = rows[1]
    assert r["n_lines"] == 4
    assert abs(r["dup_line_frac"] - 2 / 4) < 1e-12
    chars = len("keep me") + 2 * len("dup line") + len("unique tail")
    assert abs(r["dup_line_char_frac"] - (2 * len("dup line")) / chars) < 1e-12


def test_pack_sequences_contiguous_within_shard(spark):
    from web_crawler_spark.operators.corpus import pack_sequences

    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        # 0..4 extra tokens per doc on top of a 10-token base
        F.concat_ws(" ", *[F.when(F.col("id") % 5 >= i, F.lit(f"w{i}"))
                           for i in range(5)],
                    F.lit("a b c d e f g h i j")).alias("text"),
    )
    plan = pack_sequences(df, seq_len=16, n_shards=4).collect()
    by_shard = {}
    for r in plan:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["start_offset"])
        # offsets tile the shard exactly: no gaps, no overlaps
        pos = 0
        for r in rows:
            assert r["start_offset"] == pos
            pos += r["n_tokens"]
            assert r["first_seq"] == r["start_offset"] // 16
            assert r["last_seq"] == (r["start_offset"] + r["n_tokens"] - 1) // 16
    # determinism: identical plan on re-run
    again = pack_sequences(df, seq_len=16, n_shards=4).collect()
    assert sorted(map(tuple, plan)) == sorted(map(tuple, again))


def test_pack_sequences_empty_doc_occupies_eos_only(spark):
    from web_crawler_spark.operators.corpus import pack_sequences

    df = spark.createDataFrame([(1, ""), (2, "one two")],
                               "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            pack_sequences(df, seq_len=8, n_shards=1).collect()}
    assert rows[1]["n_tokens"] == 1       # just the EOS separator
    assert rows[2]["n_tokens"] == 3


def test_corpus_datasheet_rollup_levels(spark):
    from web_crawler_spark.operators.corpus import corpus_datasheet

    df = spark.createDataFrame(
        [(1, "a b", "s1", "en"), (2, "", "s1", "en"),
         (3, "c", "s1", "de"), (4, "d e f", "s2", "en")],
        "doc_id long, text string, source string, lang string",
    )
    rows = {(r["source"], r["lang"]): r for r in corpus_datasheet(df).collect()}
    assert rows[("s1", "en")]["n_docs"] == 2
    assert rows[("s1", "en")]["n_tokens"] == 2
    assert rows[("s1", "en")]["n_empty"] == 1
    # source subtotal and grand total come from the same single pass
    assert rows[("s1", None)]["n_docs"] == 3
    assert rows[("s1", None)]["n_tokens"] == 3
    assert rows[(None, None)]["n_docs"] == 4
    assert rows[(None, None)]["n_tokens"] == 6
    assert rows[(None, None)]["n_chars"] == len("a b") + len("c") + len("d e f")


def test_compression_ratio_separates_repetition_from_prose(spark):
    from web_crawler_spark.operators.corpus import compression_ratio_stage

    prose = ("The quick brown fox jumps over the lazy dog while seventeen "
             "wildly different words follow without any repetition at all, "
             "because entropy matters for this particular estimate today.")
    spammy = "buy cheap buy cheap buy cheap " * 40
    df = spark.createDataFrame(
        [(1, prose), (2, spammy), (3, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in compression_ratio_stage(df).collect()}
    assert got[1]["raw_bytes"] == len(prose.encode())
    assert got[2]["compression_ratio"] < 0.1 < got[1]["compression_ratio"]
    assert got[3]["compression_ratio"] is None and got[3]["raw_bytes"] == 0
    # deterministic for a fixed level
    again = {r["doc_id"]: r["compression_ratio"]
             for r in compression_ratio_stage(df).collect()}
    assert again[2] == got[2]["compression_ratio"]
