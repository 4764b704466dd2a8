"""temperature_mix_rates (corpus.py): Arivazhagan-style temperature
sampling — hand-computed q at tau=2, tau=1 == natural share, flattening
monotonicity, cap semantics, empty corpus."""

import math

import pytest

from web_crawler_spark.operators import corpus as C


def _df(spark, sizes):
    # sizes: {source: n_tokens} via one doc of n whitespace tokens
    rows = [
        (i, " ".join(["w"] * n), s)
        for i, (s, n) in enumerate(sorted(sizes.items()))
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _rates(out):
    return {r["source"]: r for r in out}


def test_hand_computed_tau2(spark):
    # tokens: a=9000, b=900, c=100 -> total 10000
    out = C.temperature_mix_rates(
        _df(spark, {"a": 9000, "b": 900, "c": 100}), budget_tokens=1000
    ).collect()
    r = _rates(out)
    qs = {s: math.sqrt(t / 10000.0) for s, t in
          [("a", 9000), ("b", 900), ("c", 100)]}
    z = qs["a"] + qs["b"] + qs["c"]
    for s in qs:
        assert r[s]["q_rate"] == pytest.approx(round(qs[s] / z, 6), abs=1e-9)
        assert r[s]["alloc_tokens"] == math.floor(1000.0 * (qs[s] / z))
        assert not r[s]["capped"]
    # temperature up-weights the tail vs natural share
    assert r["c"]["q_rate"] > 100 / 10000.0
    assert r["a"]["q_rate"] < 9000 / 10000.0


def test_tau1_is_natural_share(spark):
    out = C.temperature_mix_rates(
        _df(spark, {"a": 7500, "b": 2500}), budget_tokens=100, tau=1.0
    ).collect()
    r = _rates(out)
    assert r["a"]["q_rate"] == pytest.approx(0.75, abs=1e-6)
    assert r["b"]["q_rate"] == pytest.approx(0.25, abs=1e-6)


def test_higher_tau_flattens(spark):
    df = _df(spark, {"a": 9000, "b": 1000})
    q2 = _rates(C.temperature_mix_rates(df, 100, tau=2.0).collect())
    q5 = _rates(C.temperature_mix_rates(df, 100, tau=5.0).collect())
    assert q5["b"]["q_rate"] > q2["b"]["q_rate"] > 0.1
    assert q5["a"]["q_rate"] < q2["a"]["q_rate"] < 0.9


def test_cap_at_availability(spark):
    # tiny source: budget share exceeds its tokens -> capped, alloc = T_s
    out = C.temperature_mix_rates(
        _df(spark, {"big": 10000, "tiny": 4}), budget_tokens=8000
    ).collect()
    r = _rates(out)
    assert r["tiny"]["capped"] and r["tiny"]["alloc_tokens"] == 4
    assert not r["big"]["capped"]


def test_empty_corpus(spark):
    df = _df(spark, {"a": 1}).limit(0)
    assert C.temperature_mix_rates(df, 100).count() == 0
