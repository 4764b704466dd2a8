"""jain_fairness (aggregate.py): closed-form values — uniform 1.0,
k-of-n sharing k/n, monopoly 1/n, empty NULL."""

import pytest

from web_crawler_spark.operators.aggregate import jain_fairness


def _frontier(spark, hosts):
    return spark.createDataFrame([(h,) for h in hosts], "host string")


def test_uniform_is_one(spark):
    out = jain_fairness(_frontier(spark, ["a", "b", "c"] * 4)).collect()[0]
    assert out["n_hosts"] == 3 and out["total"] == 12
    assert out["jain"] == pytest.approx(1.0, abs=1e-9)


def test_k_of_n_equal_share(spark):
    # 2 of 4 hosts share equally -> J = 2/4 = 0.5
    hosts = ["a"] * 6 + ["b"] * 6 + ["c"] * 0 + ["d"] * 0
    # hosts c,d appear once each to exist with negligible share? no —
    # Jain counts only hosts present; plant them with tiny-but-equal 0?
    # canonical k-of-n: hosts with zero service don't appear in the
    # frontier, so use explicit 4 hosts where 2 dominate equally:
    hosts = ["a"] * 10 + ["b"] * 10 + ["c"] * 1 + ["d"] * 1
    out = jain_fairness(_frontier(spark, hosts)).collect()[0]
    # J = 22^2 / (4 * (100+100+1+1)) = 484/808
    assert out["jain"] == pytest.approx(round(484 / 808, 6), abs=1e-9)


def test_monopoly_tends_to_one_over_n(spark):
    hosts = ["hog"] * 100 + ["x", "y", "z"]
    out = jain_fairness(_frontier(spark, hosts)).collect()[0]
    # J = 103^2/(4*10003) ≈ 0.2651 — near 1/n = 0.25
    assert out["jain"] == pytest.approx(round(103 ** 2 / (4 * 10003), 6),
                                        abs=1e-9)
    assert out["jain"] < 0.3


def test_empty_frontier_null(spark):
    out = jain_fairness(_frontier(spark, [])).collect()[0]
    assert out["n_hosts"] == 0 and out["jain"] is None
