"""Property-based fidelity tests (SURVEY §5.2.1 extended): random
adversarial strings → Spark column semantics must equal the pure-Python
reference oracles byte-for-byte. Each hypothesis example is a BATCH of
strings so one Spark job covers dozens of cases."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from test_scalars import (
    ref_clean_percentage,
    ref_clean_price,
    ref_extract_symbol,
    _run_scalar,
)
from web_crawler_spark.functions import scalars as S

# digits, separators, signs, currency junk, whitespace, CJK — everything the
# X1/X2 regex-delete path can see. Letters are excluded from float-parse risk
# by construction (the reference deletes [^\d.,-] before parsing).
_PRICE_ALPHABET = "0123456789.,-+$€¥%/bblozkg 元美"

_price_strings = st.text(alphabet=_PRICE_ALPHABET, min_size=0, max_size=24)

_SYM_ALPHABET = "ABCXYZabc123:COMUSDCUR "
_sym_strings = st.text(alphabet=_SYM_ALPHABET, min_size=0, max_size=20)

_SETTINGS = settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_SETTINGS
@given(st.lists(_price_strings, min_size=40, max_size=40))
def test_clean_price_property(spark, values):
    got = _run_scalar(spark, values, S.clean_price)
    want = [ref_clean_price(v) for v in values]
    mismatches = [(v, g, w) for v, g, w in zip(values, got, want) if g != w]
    assert not mismatches, mismatches[:5]


@_SETTINGS
@given(st.lists(_price_strings, min_size=40, max_size=40))
def test_clean_percentage_property(spark, values):
    got = _run_scalar(spark, values, S.clean_percentage)
    want = [ref_clean_percentage(v) for v in values]
    mismatches = [(v, g, w) for v, g, w in zip(values, got, want) if g != w]
    assert not mismatches, mismatches[:5]


@_SETTINGS
@given(st.lists(_sym_strings, min_size=40, max_size=40))
def test_extract_symbol_property(spark, values):
    got = _run_scalar(spark, values, S.extract_symbol)
    want = [ref_extract_symbol(v) for v in values]
    mismatches = [(v, g, w) for v, g, w in zip(values, got, want) if g != w]
    assert not mismatches, mismatches[:5]
