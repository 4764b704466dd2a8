"""code_profile (functions/text.py): hand-counted signals on known
snippets; prose stays clean."""

from pyspark.sql import functions as F

from web_crawler_spark.functions import text as T


def _profile(spark, text):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(*T.code_profile(F.col("t"))).collect()[0]


def test_python_snippet_counts(spark):
    code = "def f(x):\n    return x + 1\nimport os\nv = 1;"
    r = _profile(spark, code)
    assert r["n_lines"] == 4
    # code lines: indented return (4 spaces), 'v = 1;' terminator
    assert r["code_lines"] == 2
    # keywords: def, return, import
    assert r["kw_hits"] == 3
    # symbols: ( ) : -> ():  plus ( ) = + = ;  -> count of [{}();=<>[]]
    assert r["sym_chars"] == len([c for c in code if c in "{}();=<>[]"])


def test_prose_is_clean(spark):
    prose = ("The quick brown fox jumps over the lazy dog. "
             "It was a bright spring morning in the valley.")
    r = _profile(spark, prose)
    assert r["code_lines"] == 0 and r["kw_hits"] == 0
    assert r["n_lines"] == 1


def test_tab_indent_and_brace_terminator(spark):
    code = "\tconsole.log(1)\nif (a) {\n}"
    r = _profile(spark, code)
    # tab-indented line + '{'-terminated line + '}' line
    assert r["code_lines"] == 3


def test_keyword_word_boundary(spark):
    # 'definition' and 'classic' must NOT match def/class
    r = _profile(spark, "the definition of a classic importer")
    assert r["kw_hits"] == 0
