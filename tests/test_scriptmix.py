"""script_profile (functions/text.py) + the tx_script_mix query algebra."""

import pyspark.sql.functions as F

from web_crawler_spark.functions.text import SCRIPT_BLOCKS, script_profile


def _profile(spark, s):
    df = spark.createDataFrame([(s,)], ["t"])
    row = df.select(
        *[c.alias(n) for n, c in script_profile(F.col("t"))]
    ).collect()[0]
    return {n: row[n] for n, _ in SCRIPT_BLOCKS}


def test_counts_closed_form(spark):
    got = _profile(spark, "abc где αβ مر 中文 ひら 한글 123 .!")
    assert got == {
        "latin": 3, "cyrillic": 3, "greek": 2, "arabic": 2, "cjk": 6,
    }


def test_homoglyph_spoof_counts(spark):
    # Cyrillic а/е/о inside Latin words: 3 cyrillic chars, rest latin
    got = _profile(spark, "paypаl sеcure lоgin")
    assert got["cyrillic"] == 3
    assert got["latin"] == 14
    assert got["greek"] == got["arabic"] == got["cjk"] == 0


def test_digits_punct_space_ignored(spark):
    got = _profile(spark, "12345 .,;!? \t\n")
    assert all(v == 0 for v in got.values())


def test_latin1_letters_counted(spark):
    got = _profile(spark, "naïve café Ærø")
    assert got["latin"] == 12
