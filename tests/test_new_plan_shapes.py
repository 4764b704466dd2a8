"""Plan-shape regressions pinning the scale claims of this session's
operators: no cartesian products anywhere, and the documented
slim-columns-only exchanges hold."""

from pyspark.sql import functions as F

from web_crawler_spark.operators import corpus as C
from web_crawler_spark.operators import graph as G


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    rows = [(i, f"some words here w{i} {'x' * (i % 7)}", f"s{i % 3}")
            for i in range(40)]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_postings_vbyte_no_cartesian_and_slim_window(spark):
    plan = _plan(C.postings_vbyte_size(_docs(spark)))
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    # the raw text column never crosses an exchange — only term/doc_id do
    for frag in plan.split("Exchange")[1:]:
        head = frag.split("+- ")[0]
        assert "text" not in head


def test_temperature_mix_text_never_shuffles(spark):
    plan = _plan(C.temperature_mix_rates(_docs(spark), budget_tokens=100))
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    for frag in plan.split("Exchange")[1:]:
        assert "text" not in frag.split("+- ")[0]


def test_seed_attribution_no_cartesian(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")],
        "src_host string, dst_host string",
    )
    s = spark.createDataFrame([("a",)], "node string")
    plan = _plan(G.seed_attribution(e, s, max_depth=3))
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_densification_fit_no_cartesian(spark):
    e = spark.createDataFrame(
        [("a", "b", 0), ("b", "c", 1), ("c", "d", 2)],
        "src_host string, dst_host string, epoch long",
    )
    plan = _plan(G.densification_fit(e))
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_ct_langid_no_cartesian(spark):
    tr = spark.createDataFrame(
        [("en", "the fox and the dog"), ("de", "der fuchs und der hund")],
        "lang string, text string",
    )
    d = spark.createDataFrame([(1, "the dog")], "doc_id long, text string")
    prof = C.cavnar_trenkle_profiles(tr, k=10)
    plan = _plan(C.cavnar_trenkle_classify(d, prof, k=10))
    assert "CartesianProduct" not in plan
    # the k-penalty is arithmetic: no per-language replication join of
    # the doc profile (exactly one join against the profile table)


def test_decode_entities_zero_shuffle(spark):
    from web_crawler_spark.functions import text as T

    df = spark.createDataFrame([("a&#65;&amp;b",)], "t string")
    for expr in (T.decode_entities(F.col("t")),
                 T.decode_numeric_entities(F.col("t"))):
        plan = _plan(df.select(expr.alias("d")))
        assert "Exchange" not in plan and "Join" not in plan
