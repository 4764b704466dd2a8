"""tx_langid_confidence: margin semantics on planted texts."""

import __spark_entry__ as E
from pyspark.sql import functions as F
from web_crawler_spark.functions import text as T


def _row(spark, text):
    hits = [T.stopword_hits(F.col("t"), lang) for lang in sorted(T.STOPWORDS)]
    arr = F.sort_array(F.array(*hits), asc=False)
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(
        T.detect_language(F.col("t")).alias("lang"),
        arr[0].alias("best"), arr[1].alias("second"),
        ((arr[0] - arr[1] >= 2) & (arr[0] > 0)).alias("conf"),
    ).collect()[0]


def test_confident_english(spark):
    r = _row(spark, "the cat and the dog that sat in the sun for a while")
    assert r["lang"] == "en" and r["conf"] and r["best"] - r["second"] >= 2


def test_ambiguous_margin_not_confident(spark):
    # 'de' words la/le overlap fr/es: craft a near-tie
    r = _row(spark, "der la")
    assert r["best"] >= 1 and not r["conf"]


def test_no_hits_not_confident(spark):
    r = _row(spark, "zzz qqq 123")
    assert r["lang"] == "unknown" and r["best"] == 0 and not r["conf"]


def test_registry(spark):
    rows = E.queries()["tx_langid_confidence"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows[:50]:
        assert r["margin"] == r["best_hits"] - r["second_hits"]
        assert r["confident"] == (r["margin"] >= 2 and r["best_hits"] > 0)
