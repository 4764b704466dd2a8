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
