"""decode_numeric_entities (functions/text.py): codepoint classes incl.
4-byte emoji, invalid references kept literal, no-ref identity."""

from pyspark.sql import functions as F

from web_crawler_spark.functions import text as T


def _dec(spark, s):
    df = spark.createDataFrame([(s,)], "t string")
    return df.select(
        T.decode_numeric_entities(F.col("t")).alias("d")
    ).collect()[0]["d"]


def test_all_utf8_widths(spark):
    assert _dec(spark, "&#65;") == "A"                       # 1 byte
    assert _dec(spark, "&#1088;") == "р"                # 2 bytes
    assert _dec(spark, "&#8212; &#x20AC;") == "— €"  # 3 bytes
    assert _dec(spark, "&#x1F600;") == "\U0001F600"          # 4 bytes


def test_invalid_kept_literal(spark):
    s = "&#0; &#xD800; &#1114112;"
    assert _dec(spark, s) == s


def test_mixed_and_identity(spark):
    assert _dec(spark, "a&#66;c&#x44;e") == "aBcDe"
    assert _dec(spark, "plain text & more") == "plain text & more"
    # hex case-insensitivity in the marker
    assert _dec(spark, "&#X41;") == "A"
