"""densification / densification_fit (graph.py): Leskovec et al. growth
curve — hand-checked cumulative counts, exact OLS exponent on a closed-form
quadratic growth, first-seen semantics, single-epoch NULL fit."""

import math

import pytest

from web_crawler_spark.operators import graph as G


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "src_host string, dst_host string, epoch long"
    )


def test_growth_curve_hand_counts(spark):
    rows = [
        ("a", "b", 0), ("b", "a", 0), ("a", "b", 0),   # dup edge collapses
        ("a", "c", 1), ("c", "c", 1),                   # self loop dropped
        ("d", "a", 2), ("d", "b", 2), ("c", "b", 2),
    ]
    out = {r["epoch"]: r for r in G.densification(_df(spark, rows)).collect()}
    assert out[0]["new_nodes"] == 2 and out[0]["new_edges"] == 2
    assert out[1]["new_nodes"] == 1 and out[1]["new_edges"] == 1
    assert out[2]["new_nodes"] == 1 and out[2]["new_edges"] == 3
    assert out[2]["cum_nodes"] == 4 and out[2]["cum_edges"] == 6


def test_node_first_epoch_is_first_touching_edge(spark):
    # node c first appears as a DST at epoch 0, then as src at epoch 3
    rows = [("a", "c", 0), ("c", "b", 3)]
    out = {r["epoch"]: r for r in G.densification(_df(spark, rows)).collect()}
    assert out[0]["new_nodes"] == 2     # a and c
    assert out[3]["new_nodes"] == 1     # b only


def test_exact_powerlaw_exponent(spark):
    # cum_nodes = 4^(t+1), cum_edges = 8^(t+1) = cum_nodes^1.5 -> the
    # log-log points are exactly collinear with slope 1.5, r2 == 1
    rows = []
    seen = set()
    for t in range(4):
        want_n, want_e = 4 ** (t + 1), 8 ** (t + 1)
        for i in range(want_n):
            for j in range(want_n):
                if i != j and (i, j) not in seen and len(seen) < want_e:
                    seen.add((i, j))
                    rows.append((f"n{i}", f"n{j}", t))
        assert len(seen) == want_e
    fit = G.densification_fit(_df(spark, rows)).collect()[0]
    assert fit["n_epochs"] == 4
    assert fit["exponent"] == pytest.approx(1.5, abs=1e-6)
    assert fit["r2"] == pytest.approx(1.0, abs=1e-6)
    assert fit["cum_nodes"] == 256 and fit["cum_edges"] == 4096


def test_single_epoch_null_fit(spark):
    fit = G.densification_fit(_df(spark, [("a", "b", 0)])).collect()[0]
    assert fit["n_epochs"] == 1
    assert fit["exponent"] is None and fit["r2"] is None
    assert fit["cum_nodes"] == 2 and fit["cum_edges"] == 1
