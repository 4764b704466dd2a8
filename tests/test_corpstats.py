"""Corpus-statistics operators: Flesch readability, Heaps vocabulary
growth, Zipf rank-frequency OLS fit — hand-checked counts, invariants,
and exact differential parity with a pure-Python left-fold OLS."""

import math

from web_crawler_spark.operators.corpus import (
    readability_scores,
    vocab_growth,
    zipf_fit,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_readability_hand_counts(spark):
    rows = readability_scores(
        _docs(spark, ["The cat sat. It ran!", "", "no terminators here"])
    ).orderBy("doc_id").collect()
    r0 = rows[0]
    # whitespace words: "The cat sat. It ran!" -> 5; vowel groups: 5
    assert (r0["n_words"], r0["n_sentences"], r0["n_syllables"]) == (5, 2, 5)
    assert r0["flesch"] == round(206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5), 6)
    assert rows[1]["n_words"] == 0 and rows[1]["flesch"] is None
    assert rows[2]["n_sentences"] == 1  # fragment counts as one sentence


def test_readability_simpler_text_scores_higher(spark):
    simple = "The dog ran. The cat sat. We go now."
    dense = (
        "Notwithstanding considerable institutional heterogeneity, "
        "organizational imperatives necessitate comprehensive evaluation."
    )
    rows = {r["doc_id"]: r["flesch"] for r in readability_scores(
        _docs(spark, [simple, dense])).collect()}
    assert rows[0] > rows[1]


def test_vocab_growth_invariants(spark):
    texts = ["a b c", "b c d", "a e", "f f f"]
    rows = vocab_growth(_docs(spark, texts)).orderBy("doc_id").collect()
    assert [r["new_terms"] for r in rows] == [3, 1, 1, 1]
    assert [r["vocab_size"] for r in rows] == [3, 4, 5, 6]
    assert [r["cum_tokens"] for r in rows] == [3, 6, 8, 11]
    vs = [r["vocab_size"] for r in rows]
    assert vs == sorted(vs)


def test_zipf_exact_parity_and_slope(spark):
    """Corpus built with exact 1/r frequencies: Spark OLS must equal the
    pure-Python left-fold OLS bit-for-bit (same accumulation order), and
    the slope must sit near -1."""
    n_terms, c = 40, 120
    words = []
    for r in range(1, n_terms + 1):
        words += [f"t{r:03d}"] * (c // r)
    # one doc per 25 words, deterministic layout
    texts = [" ".join(words[i:i + 25]) for i in range(0, len(words), 25)]
    got = zipf_fit(_docs(spark, texts), max_rank=n_terms).collect()[0]

    freq = sorted(
        ((c // r, f"t{r:03d}") for r in range(1, n_terms + 1)),
        key=lambda t: (-t[0], t[1]),
    )
    xs = [math.log(i + 1) for i in range(len(freq))]
    ys = [math.log(f) for f, _ in freq]
    n = float(len(xs))
    sx = sum(xs, 0.0); sy = sum(ys, 0.0)
    sxx = sum((x * x for x in xs), 0.0)
    syy = sum((y * y for y in ys), 0.0)
    sxy = sum((x * y for x, y in zip(xs, ys)), 0.0)
    cov, varx, vary = sxy - sx * sy / n, sxx - sx * sx / n, syy - sy * sy / n
    assert got["n_ranks"] == n_terms
    assert got["slope"] == round(cov / varx, 6)
    assert got["intercept"] == round((sy - (cov / varx) * sx) / n, 6)
    assert got["r2"] == round(cov * cov / (varx * vary), 6)
    assert -1.15 < got["slope"] < -0.85 and got["r2"] > 0.97


def test_rrf_fusion_hand_example(spark):
    from web_crawler_spark.operators.corpus import rrf_fuse

    r1 = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    r2 = spark.createDataFrame(
        [(20, 1), (40, 2)], "doc_id long, rank int"
    )
    got = {r["doc_id"]: r for r in rrf_fuse([r1, r2], k=60).collect()}
    assert got[20]["rrf_score"] == round(1 / 62 + 1 / 61, 6)
    assert got[20]["n_systems"] == 2
    assert got[10]["rrf_score"] == round(1 / 61, 6)
    assert got[40]["n_systems"] == 1
    # consensus doc beats any single-system doc at equal top ranks
    assert got[20]["rrf_score"] > got[10]["rrf_score"]


def test_rrf_k_dampens_rank_gaps(spark):
    from web_crawler_spark.operators.corpus import rrf_fuse

    r1 = spark.createDataFrame([(1, 1), (2, 10)], "doc_id long, rank int")
    small = {r["doc_id"]: r["rrf_score"] for r in rrf_fuse([r1], k=1).collect()}
    big = {r["doc_id"]: r["rrf_score"] for r in rrf_fuse([r1], k=600).collect()}
    assert small[1] / small[2] > big[1] / big[2]


def test_passage_retrieval_composition(spark):
    """End-to-end passages → hash-embed → cosine: the query passage
    retrieves itself at rank 1 with cosine 1.0, and overlapping windows
    from the same document outscore unrelated documents."""
    from pyspark.sql import functions as F

    from web_crawler_spark.functions import hashembed as HE
    from web_crawler_spark.operators.corpus import passage_windows
    from web_crawler_spark.operators.similarity import cosine_topk

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu alpha beta gamma delta epsilon zeta eta theta",
        "completely different words about other topics entirely "
        "nothing shared with the first document at all here",
    ]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    p = passage_windows(d, window_tokens=8, stride=4).select(
        (F.col("doc_id") * 1000 + F.col("passage_id")).alias("pid"),
        F.col("passage").alias("text"),
    )
    emb = HE.hash_embed(p, text_col="text", id_col="pid", dim=32, salt="t")
    qv = [float(x) for x in emb.filter(F.col("doc_id") == 0)
          .collect()[0]["embedding"]]
    top = cosine_topk(emb, qv, k=4, id_col="doc_id").collect()
    assert top[0]["doc_id"] == 0 and top[0]["cosine"] == 1.0
    # all top-4 from document 0's window family (pids < 1000)
    assert all(r["doc_id"] < 1000 for r in top)


def test_pmi_collocations_hand_computed(spark):
    import math

    from web_crawler_spark.operators.corpus import pmi_collocations

    # 'new york' always adjacent (high PMI); 'the the' frequent but both
    # parts ubiquitous (low PMI); hapax pairs gated by min_count
    docs = spark.createDataFrame(
        [(i, "new york the a b the c d the rare%d gem%d" % (i, i))
         for i in range(6)],
        ["doc_id", "text"],
    )
    got = {(r["a"], r["b"]): r for r in
           pmi_collocations(docs, k=50, min_count=3).collect()}
    assert ("rare0", "gem0") not in got        # hapax gated
    ny, tt = got[("new", "york")], got.get(("the", "a"))
    assert ny["n_ab"] == 6
    # hand PMI: 11 tokens/doc -> N_uni = 66, N_bi = 60, n_new = n_york = 6
    want = math.log((6 / 60) / ((6 / 66) * (6 / 66)))
    assert abs(ny["pmi"] - round(want, 6)) <= 1e-6
    assert tt is not None and ny["pmi"] > tt["pmi"]


def test_char_entropy_known_distributions(spark):
    from web_crawler_spark.operators.corpus import char_entropy

    docs = spark.createDataFrame(
        [(1, "aaaaaaaa"), (2, "abababab"), (3, "abcdefgh"), (4, ""), (5, None)],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in char_entropy(docs).collect()}
    assert set(got) == {1, 2, 3}              # empty/NULL docs absent
    assert got[1]["entropy_bits"] == 0.0      # single symbol
    assert abs(got[2]["entropy_bits"] - 1.0) <= 1e-6   # fair coin
    assert abs(got[3]["entropy_bits"] - 3.0) <= 1e-6   # 8 uniform symbols
    assert got[3]["n_unique_chars"] == 8 and got[3]["n_chars"] == 8


def test_slice_kl_terms_distinctive_vocab(spark):
    from web_crawler_spark.operators.corpus import slice_kl_terms
    from pyspark.sql import functions as F

    rows = [(i, "en", "common words plus specialjargon here") for i in range(5)]
    rows += [(i + 10, "de", "common words plus ordinary filler here") for i in range(5)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    got = [r["term"] for r in
           slice_kl_terms(docs, F.col("lang") == "en", k=3).collect()]
    # the slice-exclusive term dominates the KL contribution ranking
    assert got[0] == "specialjargon"
    # terms absent from the slice contribute negatively -> never in top
    assert "ordinary" not in got


def test_slice_kl_null_pred_and_empty(spark):
    from web_crawler_spark.operators.corpus import slice_kl_terms
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, None, "alpha beta"), (2, "en", "alpha gamma")],
        "doc_id bigint, lang string, text string",
    )
    # NULL lang rows count as out-of-slice, not dropped
    got = {r["term"]: r for r in
           slice_kl_terms(docs, F.col("lang") == "en", k=10).collect()}
    assert got["alpha"]["n_corpus"] == 2 and got["alpha"]["n_slice"] == 1
    empty = spark.createDataFrame([], "doc_id bigint, lang string, text string")
    assert slice_kl_terms(empty, F.col("lang") == "en").count() == 0
