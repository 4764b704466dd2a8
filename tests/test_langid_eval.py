"""tx_langid_eval confusion-matrix shape: exact counts and recall_milli
on a planted mixed-language frame (uses the engine's own detector as the
system under evaluation)."""

from pyspark.sql import functions as F

from web_crawler_spark.functions import text as T


def test_confusion_matrix_counts_and_recall(spark):
    rows = [
        ("en", "the quick brown fox and the lazy dog with some words"),
        ("en", "this is another english sentence with the usual words"),
        ("en", "zzz qqq xxx"),               # likely not detected as en
        ("de", "der schnelle braune fuchs und der faule hund"),
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    pred = df.select("lang", T.detect_language(F.col("text")).alias("d"))
    cell = pred.groupBy("lang", "d").agg(F.count(F.lit(1)).alias("n"))
    w = __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy("lang")
    out = cell.select(
        "lang", "d", "n",
        F.floor(F.lit(1000) * F.col("n") / F.sum("n").over(w))
        .cast("long").alias("recall_milli"),
    ).collect()
    by = {(r["lang"], r["d"]): r for r in out}
    en_total = sum(r["n"] for r in out if r["lang"] == "en")
    assert en_total == 3
    for r in out:
        tot = sum(x["n"] for x in out if x["lang"] == r["lang"])
        assert r["recall_milli"] == 1000 * r["n"] // tot
    assert sum(r["n"] for r in out) == 4
