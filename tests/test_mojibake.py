"""repair_mojibake (functions/text.py): UTF-8-as-cp1252 garble repair.
Differential test vs a pure-Python replay of the same replace chain, plus
roundtrip over the whole committed alphabet and no-op guarantees."""

from pyspark.sql import functions as F

from web_crawler_spark.functions.text import (
    MOJIBAKE_CHARS,
    MOJIBAKE_PAIRS,
    repair_mojibake,
    to_mojibake,
)


def _ref_repair(s: str) -> str:
    for bad, good in MOJIBAKE_PAIRS:
        s = s.replace(bad, good)
    return s


def _spark_repair(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["i", "t"])
    out = df.select("i", repair_mojibake(F.col("t")).alias("r")).collect()
    return [r.r for r in sorted(out, key=lambda r: r.i)]


SAMPLES = [
    "café déjà vu — “fancy” …",
    "naïve résumé über straße",
    "€99 ±5° © 2024 ® ™",
    "plain ascii stays untouched",
    "",
    MOJIBAKE_CHARS,  # every char of the committed alphabet at once
]


def test_roundtrip_whole_alphabet(spark):
    garbled = [to_mojibake(s) for s in SAMPLES]
    repaired = _spark_repair(spark, garbled)
    assert repaired == SAMPLES


def test_matches_pure_python_chain(spark):
    # inputs that are NOT pure garble: mixed clean+garbled, double-encoded,
    # unknown garble fragments — spark must equal the sequential chain
    mixed = [
        "clean " + to_mojibake("café") + " tail",
        to_mojibake(to_mojibake("é")),     # double-encoded
        "Ã\x81 unknown pair stays",         # not in the committed alphabet
        to_mojibake("“a” – b … c"),
    ]
    assert _spark_repair(spark, mixed) == [_ref_repair(s) for s in mixed]


def test_ascii_identity(spark):
    texts = ["hello world", "1234 !?", "a" * 500]
    assert _spark_repair(spark, texts) == texts


def test_pairs_table_shape():
    # longest-first, unique garbles, every alphabet char covered
    lens = [len(b) for b, _ in MOJIBAKE_PAIRS]
    assert lens == sorted(lens, reverse=True)
    assert len({b for b, _ in MOJIBAKE_PAIRS}) == len(MOJIBAKE_PAIRS)
    assert {g for _, g in MOJIBAKE_PAIRS} == set(MOJIBAKE_CHARS)
    # every garble is ≥2 chars: ASCII can never be rewritten
    assert min(lens) >= 2


# --- property tests (hypothesis): batched examples, one Spark call each ---

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_clean_text = st.text(
    alphabet=st.sampled_from(
        list("abc XYZ 0123456789.,!?") + list(MOJIBAKE_CHARS)
    ),
    max_size=40,
)


# max_examples=2: each example re-codegens the 70-deep replace chain
# (~20 s of Spark analysis per call); the deterministic tests above
# already pin the whole alphabet — the property adds random COMPOSITIONS
@settings(max_examples=2, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_clean_text, min_size=12, max_size=12))
def test_property_roundtrip_and_chain_parity(spark, texts):
    garbled = [to_mojibake(t) for t in texts]
    repaired = _spark_repair(spark, garbled)
    # roundtrip: garble then repair is the identity — but ONLY on clean
    # text that is itself a repair fixpoint. A random composition like
    # 'Ã–' IS the garble of 'Ö'; repairing its garble collapses both
    # levels (the inherent mojibake ambiguity ftfy shares), so such
    # inputs are outside the roundtrip guarantee by construction.
    for t, r in zip(texts, repaired):
        if _ref_repair(t) == t:
            assert r == t
    # arbitrary mixed input (fixpoint or not) must equal the sequential
    # chain replay — the unconditional differential contract
    mixed = [t + g for t, g in zip(texts, garbled)]
    assert _spark_repair(spark, mixed) == [_ref_repair(s) for s in mixed]
