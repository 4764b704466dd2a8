"""decode_entities (functions/text.py): one-layer decode semantics."""

from pyspark.sql import functions as F

from web_crawler_spark.functions import text as T


def _dec(spark, s):
    df = spark.createDataFrame([(s,)], "t string")
    return df.select(T.decode_entities(F.col("t")).alias("d")).collect()[0]["d"]


def test_common_entities(spark):
    assert _dec(spark, "Tom &amp; Jerry&nbsp;&mdash;&nbsp;ok") == \
        "Tom & Jerry — ok"
    assert _dec(spark, "&ldquo;hi&rdquo; &copy;2024 &euro;5") == \
        "“hi” ©2024 €5"
    assert _dec(spark, "&lt;b&gt;bold&lt;/b&gt;") == "<b>bold</b>"


def test_exactly_one_escaping_layer(spark):
    # double-escaped input loses exactly one layer per pass
    assert _dec(spark, "&amp;lt;tag&amp;gt;") == "&lt;tag&gt;"
    assert _dec(spark, _dec(spark, "&amp;lt;x&amp;gt;")) == "<x>"
    assert _dec(spark, "&amp;amp;") == "&amp;"


def test_untouched_text(spark):
    plain = "no entities here & a bare ampersand < too"
    assert _dec(spark, plain) == plain
