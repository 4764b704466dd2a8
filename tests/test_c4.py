"""C4 cleaning gate (Raffel et al. 2020 §2.2) semantics."""
from pyspark.sql import functions as F

from web_crawler_spark.operators.corpus import c4_clean


def _run(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return c4_clean(df, **kw).collect()[0]


def test_line_stage_keeps_only_terminal_punct_sentences(spark):
    r = _run(
        spark,
        "Good sentence number one.\n"
        "no terminal punctuation\n"
        "Tiny.\n"
        "Please enable JavaScript to continue reading.\n"
        "This site uses cookies for tracking purposes.\n"
        "Good sentence number two!",
        min_sentences=2,
    )
    assert r["text_clean"] == (
        "Good sentence number one.\nGood sentence number two!"
    )
    assert r["n_lines"] == 6 and r["n_kept"] == 2
    assert r["passed"] is True


def test_doc_gates(spark):
    # lorem ipsum anywhere in the RAW text kills the doc
    r = _run(spark, "Fine sentence here today.\nlorem ipsum dolor sit amet.",
             min_sentences=1)
    assert r["flag_lorem"] is True and r["passed"] is False
    # braces surviving into clean text kill the doc
    r = _run(spark, "A config line with {braces} in it.", min_sentences=1)
    assert r["flag_brace"] is True and r["passed"] is False
    # bad word gate is token-exact on the CLEAN text
    r = _run(spark, "This mentions badword1 in passing.",
             min_sentences=1, bad_words=("badword1",))
    assert r["flag_bad_word"] is True and r["passed"] is False
    # dropped lines cannot trigger the bad-word gate
    r = _run(spark, "Clean sentence stands alone.\nbadword1 without punct",
             min_sentences=1, bad_words=("badword1",))
    assert r["flag_bad_word"] is False and r["passed"] is True


def test_min_sentence_gate_counts_terminators(spark):
    r = _run(spark, "One sentence. And two! Also three?", min_sentences=3)
    assert r["n_sentences"] == 3 and r["flag_short"] is False
    r = _run(spark, "Only one sentence here.", min_sentences=3)
    assert r["flag_short"] is True and r["passed"] is False


def test_pure_projection_no_shuffle(spark):
    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.lit("A sentence that is fine.").alias("text"),
    )
    plan = c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_quality_model_score_semantics(spark):
    from web_crawler_spark.operators.corpus import quality_model_score

    # one bucket: every token weighs w -> score = bias + w exactly
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           quality_model_score(df, weights=[0.5], bias=0.1,
                               threshold=0.3).collect()}
    assert got[1]["score"] == 0.6 and got[1]["keep"] is True
    assert got[1]["n_tokens"] == 3
    # empty/whitespace docs score the bias exactly (no NaN, no divide)
    for d in (2, 3):
        assert got[d]["n_tokens"] == 0
        assert got[d]["score"] == 0.1 and got[d]["keep"] is False


def test_quality_model_is_pure_projection_and_deterministic(spark):
    from web_crawler_spark.operators.corpus import quality_model_score

    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), (F.col("id") % 7).cast("string")).alias("text"),
    )
    w = [((j * 13) % 9 - 4) / 4.0 for j in range(16)]
    q = quality_model_score(df, w)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    a = sorted((r["doc_id"], r["score"]) for r in q.collect())
    b = sorted((r["doc_id"], r["score"])
               for r in quality_model_score(df, w).collect())
    assert a == b
