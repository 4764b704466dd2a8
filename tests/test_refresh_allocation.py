"""Freshness-optimal recrawl allocation (operators/snapshots.py::
refresh_allocation — Cho & Garcia-Molina 2003 TODS). The oracle query
`crawl_refresh_allocation` certifies the full allocation table; these
tests pin optimality and the published counter-intuitive behavior."""

from __future__ import annotations

import math

import pytest

from web_crawler_spark.operators.snapshots import refresh_allocation


def _fresh(lam: float, c: int) -> float:
    if c <= 0:
        return 0.0
    if lam <= 0:
        return 1.0
    return (c / lam) * (1.0 - math.exp(-lam / c))


def _greedy(rates: dict[str, float], budget: int, max_c: int) -> dict[str, int]:
    """Reference allocation: take the budget largest marginal gains
    (optimal by concavity), same 9-decimal gain rounding + (key, c)
    tie-break as the operator."""
    inc = []
    for k, lam in rates.items():
        for c in range(1, max_c + 1):
            g = round(_fresh(lam, c) - _fresh(lam, c - 1), 9)
            if g > 0:
                inc.append((-g, k, c))
    inc.sort()
    out = {k: 0 for k in rates}
    for _, k, _c in inc[:budget]:
        out[k] += 1
    return out


RATES = {
    "u_never": 0.0,      # never changes: 1 crawl keeps it fresh forever
    "u_slow": 0.2,
    "u_med1": 1.0,
    "u_med2": 2.5,
    "u_fast": 50.0,      # changes 50x per period — hopeless to track
}


@pytest.fixture()
def rates_df(spark):
    return spark.createDataFrame(
        [(k, float(v)) for k, v in RATES.items()], ["url", "lambda_hat"]
    )


def test_matches_reference_greedy_exactly(spark, rates_df):
    budget, max_c = 9, 6
    got = {
        r["url"]: r["crawls"]
        for r in refresh_allocation(rates_df, budget, max_c).collect()
    }
    assert got == _greedy(RATES, budget, max_c)
    assert sum(got.values()) == budget


def test_fast_changer_is_abandoned(spark, rates_df):
    """The Cho result: under a tight budget the λ=50 page gets NOTHING —
    its first-crawl gain ≈ 1/50 loses to every moderate page's increments."""
    got = {
        r["url"]: r["crawls"]
        for r in refresh_allocation(rates_df, budget=8, max_per_page=6).collect()
    }
    assert got["u_fast"] == 0
    assert got["u_med1"] >= 1 and got["u_slow"] >= 1


def test_never_changing_page_crawled_exactly_once(spark, rates_df):
    got = {
        r["url"]: (r["crawls"], r["freshness"])
        for r in refresh_allocation(rates_df, budget=10, max_per_page=6).collect()
    }
    assert got["u_never"] == (1, 1.0)


def test_loose_budget_saturates_and_freshness_monotone(spark, rates_df):
    """Budget ≥ all positive increments: every page takes every useful
    increment; freshness equals the closed form at the taken count."""
    out = refresh_allocation(rates_df, budget=10_000, max_per_page=5).collect()
    for r in out:
        lam = RATES[r["url"]]
        expect = 1 if lam <= 0 else 5
        assert r["crawls"] == expect
        assert r["freshness"] == pytest.approx(
            round(_fresh(lam, r["crawls"]), 6), abs=1e-9
        )


def test_ranking_has_no_row_level_single_partition_exchange(spark, rates_df):
    """The global top-B rides prefix_sum's two-level scan (its range
    exchange sits behind the localCheckpoint, plan-asserted in
    test_prefixsum.py); here: the only SinglePartition exchange in the
    visible plan is the tiny per-physical-partition offsets window, and
    what crosses the checkpoint per row is the slim increment tuple —
    no text/struct payload."""
    plan = (
        refresh_allocation(rates_df, budget=8, max_per_page=6)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange SinglePartition") == 1
    import re

    scans = re.findall(r"Scan ExistingRDD\[([^\]]*__part[^\]]*)\]", plan)
    assert scans, plan
    for cols in scans:
        assert len(cols.split(",")) <= 7, cols


def test_frontier_ucb_explore_exploit(spark):
    """UCB1: never-pulled hosts rank first; between equal-mean hosts the
    less-pulled one gets the bigger bonus; heavy-pull high-mean vs
    light-pull low-mean ordering follows the computed index."""
    import math

    from web_crawler_spark.operators.snapshots import frontier_ucb

    stats = spark.createDataFrame(
        [
            ("a", 100, 80),   # mean .8, tiny bonus
            ("b", 4, 3),      # mean .75, big bonus
            ("c", 4, 1),      # mean .25, big bonus
            ("fresh", 0, 0),  # never pulled
        ],
        "host string, n_pulls long, total_reward long",
    )
    rows = {r["host"]: r for r in frontier_ucb(stats, c=2.0).collect()}
    t = 108.0
    assert rows["fresh"]["rank"] == 1 and rows["fresh"]["ucb"] is None
    for h, n, rw in (("a", 100, 80), ("b", 4, 3), ("c", 4, 1)):
        assert rows[h]["ucb"] == round(rw / n + 2.0 * math.sqrt(math.log(t) / n), 6)
    # b's exploration bonus overtakes a's exploitation edge at c=2
    assert rows["b"]["rank"] < rows["a"]["rank"]
    assert rows["c"]["rank"] > rows["b"]["rank"]


def test_focused_priority_hand_computed(spark):
    """Focused-crawl ranking on a hand-checked micro-graph: anchor-topic
    overlap (distinct tokens), parent-relevance decay, max-over-inlinks,
    and the crawled-target anti-join."""
    from web_crawler_spark.operators.snapshots import focused_priority

    links = spark.createDataFrame(
        [
            # two inlinks to T1: strong anchor from weak page, weak anchor
            # from strong page -> priority = max of the two contributions
            ("https://a.com/p", "https://t1.com/", "Spark shuffle deep dive"),
            ("https://b.com/p", "https://t1.com/", "misc link"),
            # repeated token must count once: 'spark spark spark'
            ("https://a.com/p", "https://t2.com/", "spark spark spark"),
            # empty anchor -> parent relevance only
            ("https://b.com/p", "https://t3.com/", ""),
            # target that is already crawled -> excluded
            ("https://a.com/p", "https://b.com/p", "Spark guide"),
            # duplicate edge rows collapse
            ("https://b.com/p", "https://t3.com/", ""),
        ],
        "src_url string, dst_url string, anchor string",
    )
    scores = spark.createDataFrame(
        [("https://a.com/p", 100), ("https://b.com/p", 900)],
        "url string, relevance long",
    )
    terms = {"spark": 500, "shuffle": 300}
    rows = {
        r["dst_url"]: r
        for r in focused_priority(links, scores, terms, beta=2, gamma=1).collect()
    }
    assert "https://b.com/p" not in rows  # crawled target anti-joined out
    t1 = rows["https://t1.com/"]
    # a->t1: 2*(500+300)+100 = 1700 ; b->t1: 2*0+900 = 900 -> max 1700
    assert (t1["priority"], t1["best_anchor_score"], t1["n_inlinks"]) == (1700, 800, 2)
    t2 = rows["https://t2.com/"]
    # repeated 'spark' counts once: 2*500+100 = 1100
    assert (t2["priority"], t2["best_anchor_score"]) == (1100, 500)
    t3 = rows["https://t3.com/"]
    # empty anchor: 2*0+900 = 900; duplicate edges collapse to one inlink
    assert (t3["priority"], t3["n_inlinks"]) == (900, 1)
    assert [rows[k]["rank"] for k in
            ("https://t1.com/", "https://t2.com/", "https://t3.com/")] == [1, 2, 3]


def test_focused_priority_unknown_parent_scores_zero_relevance(spark):
    from web_crawler_spark.operators.snapshots import focused_priority

    links = spark.createDataFrame(
        [("https://unknown.com/", "https://t.com/", "crawl frontier")],
        "src_url string, dst_url string, anchor string",
    )
    scores = spark.createDataFrame([], "url string, relevance long")
    out = focused_priority(
        links, scores, {"crawl": 400, "frontier": 250}, beta=2, gamma=1
    ).collect()
    assert len(out) == 1 and out[0]["priority"] == 2 * 650
