"""DUST alias-rule mining (Bar-Yossef et al. 2007) — differential parity
vs a pure-Python factoring reference, star-pairing scale shape, edge
cases (prefix-of-other, identical-length swaps), support/length gates."""

from pyspark.sql import functions as F

from web_crawler_spark.operators.urlfilter import dust_rules


def _ref_rule(u, v):
    """Independent reference: strip longest common prefix, then longest
    common suffix of the remainder."""
    n = min(len(u), len(v))
    lcp = 0
    while lcp < n and u[lcp] == v[lcp]:
        lcp += 1
    lcs = 0
    while lcs < n and u[len(u) - 1 - lcs] == v[len(v) - 1 - lcs]:
        lcs += 1
    lcs = min(lcs, n - lcp)
    return u[lcp:len(u) - lcs], v[lcp:len(v) - lcs]


def _ref_rules(rows, min_support, max_len=40):
    groups = {}
    for fp, url in rows:
        groups.setdefault(fp, []).append(url)
    counts = {}
    for urls in groups.values():
        canon = min(urls)
        for u in urls:
            if u != canon:
                a, b = _ref_rule(u, canon)
                if len(a) <= max_len and len(b) <= max_len:
                    counts[(a, b)] = counts.get((a, b), 0) + 1
    return {(a, b, c) for (a, b), c in counts.items() if c >= min_support}


def _mine(spark, rows, **kw):
    df = spark.createDataFrame(rows, "fingerprint long, url string")
    return {
        (r["alpha"], r["beta"], r["support"])
        for r in dust_rules(df, **kw).collect()
    }


def test_reference_parity_mixed_alias_families(spark):
    rows = []
    for i in range(12):
        rows.append((i, f"https://ex.com/a/{i}"))
        rows.append((i, f"https://ex.com/a/{i}/index.html"))
        if i % 2 == 0:
            rows.append((i, f"https://www.ex.com/a/{i}"))
        if i % 3 == 0:
            rows.append((i, f"https://ex.com/a/{i}?utm=x"))
    for ms in (1, 3, 7):
        assert _mine(spark, rows, min_support=ms) == _ref_rules(rows, ms)


def test_prefix_of_other_factors_cleanly(spark):
    # canon (group min) is a strict PREFIX of the dup: alpha deletes the tail
    rows = [(1, "https://a.ex/pp"), (1, "https://a.ex/p")]
    got = _mine(spark, rows, min_support=1)
    assert got == {_ref_rule("https://a.ex/pp", "https://a.ex/p") + (1,)}
    assert got == {("p", "", 1)}


def test_max_rule_len_drops_junk_factorizations(spark):
    # two unrelated URLs sharing a fingerprint factor into a giant rule
    rows = [
        (1, "https://one.example/some/deep/path/entirely/different/x"),
        (1, "https://zzz.other/abc"),
    ] + [(2 + i, f"https://ex.com/{i}") for i in range(3)] \
      + [(2 + i, f"https://ex.com/{i}/index.html") for i in range(3)]
    got = _mine(spark, rows, min_support=1, max_rule_len=20)
    assert got == {("/index.html", "", 3)}


def test_star_pairing_not_quadratic(spark):
    """A hot fingerprint with m aliases yields m-1 pairs (star), not
    C(m,2): total support across rules equals n_dup_rows."""
    rows = [(7, f"https://h.ex/x?s={i}") for i in range(20)]
    got = _mine(spark, rows, min_support=1)
    assert sum(c for *_, c in got) == 19
    # and the mined rules factor against the single canonical
    assert _mine(spark, rows, min_support=1) == _ref_rules(rows, 1)


def test_plan_single_fp_shuffle_no_cartesian(spark):
    df = spark.createDataFrame(
        [(1, "https://a/x"), (1, "https://a/y")], "fingerprint long, url string"
    )
    plan = dust_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan
