"""Public-suffix-list eTLD+1 extraction (functions/psl.py).

Golden cases follow the PSL project's own checkPublicSuffix test
conventions (publicsuffix.org/list/ — algorithm public, MPL-2.0 list):
normal rules, multi-label registry suffixes, wildcard ``*.ck`` /
``*.kawasaki.jp``, exceptions ``!www.ck`` / ``!city.kawasaki.jp``,
private (hosting-platform) suffixes, the implicit ``*`` rule for unknown
TLDs, and NULL registrable domain when the host IS a public suffix.
Plan shape: one broadcast hash join per probed depth, zero probe-side
shuffles.
"""

import pytest
from pyspark.sql import functions as F

from web_crawler_spark.functions import psl


GOLDEN = [
    # host, public_suffix, registrable_domain
    ("example.com", "com", "example.com"),
    ("a.b.example.com", "com", "example.com"),
    ("www.example.co.uk", "co.uk", "example.co.uk"),
    ("example.co.uk", "co.uk", "example.co.uk"),
    ("co.uk", "co.uk", None),                     # host IS a public suffix
    ("uk", "uk", None),
    ("www.ck", "ck", "www.ck"),                   # exception beats wildcard
    ("b.foo.ck", "foo.ck", "b.foo.ck"),           # wildcard *.ck
    ("foo.ck", "foo.ck", None),                   # wildcard match, no +1 label
    ("ck", "ck", None),                           # bare parent of a wildcard
    ("example.unknowntld", "unknowntld", "example.unknowntld"),  # implicit *
    ("unknowntld", "unknowntld", None),
    ("user.github.io", "github.io", "user.github.io"),           # private
    ("deep.x.blogspot.com", "blogspot.com", "x.blogspot.com"),
    ("city.kawasaki.jp", "kawasaki.jp", "city.kawasaki.jp"),     # exception
    ("x.y.kawasaki.jp", "y.kawasaki.jp", "x.y.kawasaki.jp"),     # wildcard
    ("EXAMPLE.COM.", "com", "example.com"),       # case + trailing dot
    ("vm.x.compute.amazonaws.com", "x.compute.amazonaws.com",
     "vm.x.compute.amazonaws.com"),               # deep private wildcard
]


@pytest.fixture(scope="module")
def golden_out(spark):
    df = spark.createDataFrame([(h,) for h, _, _ in GOLDEN], "host string")
    rows = psl.with_registrable_domain(df).collect()
    return {r.host: (r.public_suffix, r.registrable_domain) for r in rows}


@pytest.mark.parametrize("host,ps,reg", GOLDEN)
def test_golden(golden_out, host, ps, reg):
    assert golden_out[host] == (ps, reg)


def test_parse_psl_format_and_icann_only():
    text = "// c\n\ncom\n*.ck  // trailing comment-ish annotation\n!www.ck\nUPPER.Case.\n// ===BEGIN PRIVATE DOMAINS===\ngithub.io\n"
    rules = psl.parse_psl(text)
    assert ("com", "normal") in rules
    assert ("ck", "wildcard") in rules
    assert ("www.ck", "exception") in rules
    assert ("upper.case", "normal") in rules       # lowercased, dot-stripped
    assert ("github.io", "normal") in rules
    icann = psl.parse_psl(text, icann_only=True)
    assert ("github.io", "normal") not in icann
    assert ("com", "normal") in icann


def test_rules_df_label_counts(spark):
    r = {
        row.key: (row.ps_normal, row.ps_wild, row.ps_exc)
        for row in psl.psl_rules_df(
            spark, "co.uk\n*.ck\n!www.ck\nck\n"
        ).collect()
    }
    assert r["co.uk"] == (2, None, None)
    # same key from wildcard parent AND a normal rule: both kept
    assert r["ck"] == (1, 2, None)
    assert r["www.ck"] == (None, None, 1)


def test_plan_zero_probe_side_shuffles(spark):
    df = spark.createDataFrame([("a.example.co.uk",)], "host string")
    rules = psl.psl_rules_df(spark).localCheckpoint(eager=True)
    out = psl.with_registrable_domain(df, rules=rules, max_labels=6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 6
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_passthrough_columns_and_custom_names(spark):
    df = spark.createDataFrame([(1, "x.example.com")], ["id", "h"])
    out = psl.with_registrable_domain(
        df, host_col="h", out_col="site", suffix_col=None
    )
    assert out.columns == ["id", "h", "site"]
    assert out.collect()[0].site == "example.com"


def test_registrable_domain_of_distinct_hosts(spark):
    df = spark.createDataFrame(
        [("www.example.com",), ("www.example.com",), ("a.b.co.uk",)],
        "host string",
    )
    rows = {r.host: r.registrable_domain for r in psl.registrable_domain_of(df).collect()}
    assert rows == {"www.example.com": "example.com", "a.b.co.uk": "b.co.uk"}


def test_full_list_file_shape(spark):
    # a user-supplied list goes through the same path as the snapshot
    rules = psl.psl_rules_df(spark, psl.DEFAULT_PSL, icann_only=True)
    keys = {r.key for r in rules.collect()}
    assert "co.uk" in keys and "github.io" not in keys


def test_politeness_by_site_groups_vhosts_not_private_suffixes(spark):
    from web_crawler_spark.operators.politeness import politeness_schedule_by_site

    rows = [
        ("www.shop.co.uk", 1, "https://www.shop.co.uk/a"),
        ("api.shop.co.uk", 2, "https://api.shop.co.uk/b"),
        ("shop.co.uk", 3, "https://shop.co.uk/c"),
        ("a.blogspot.com", 1, "https://a.blogspot.com/x"),
        ("b.blogspot.com", 1, "https://b.blogspot.com/y"),
    ]
    f = spark.createDataFrame(rows, ["host", "priority", "url"])
    out = politeness_schedule_by_site(
        f, F.lit("2025-01-01 00:00:00").cast("timestamp"), delay_seconds=2.0
    ).collect()
    by_site = {}
    for r in out:
        by_site.setdefault(r.site_key, []).append((r.seq, r.host, r.scheduled_ts))
    # the three shop.co.uk vhosts share ONE lane, sequenced by priority
    assert len(by_site["shop.co.uk"]) == 3
    seqs = sorted(by_site["shop.co.uk"])
    assert [s[1] for s in seqs] == ["www.shop.co.uk", "api.shop.co.uk", "shop.co.uk"]
    # 2s spacing within the lane
    assert (seqs[1][2] - seqs[0][2]).total_seconds() == 2.0
    # private-suffix subdomains are DISTINCT sites: both start at seq 1
    assert [r[0] for r in by_site["a.blogspot.com"]] == [1]
    assert [r[0] for r in by_site["b.blogspot.com"]] == [1]


def test_domain_quota_pools_vhosts_and_separates_private(spark):
    from web_crawler_spark.operators import corpus as CO

    rows = (
        [(i, "www.site.co.uk", 100 - i) for i in range(4)]
        + [(10 + i, "img.site.co.uk", 50 - i) for i in range(4)]
        + [(20 + i, "a.blogspot.com", 10) for i in range(3)]
        + [(30 + i, "b.blogspot.com", 10) for i in range(3)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "host", "score"])
    out = CO.domain_quota(
        df, quota=3, order_by=[F.col("score").desc(), "doc_id"], keep_rank=True
    ).collect()
    sites = {}
    for r in out:
        sites.setdefault(r.site, []).append(r.doc_id)
    # both site.co.uk vhosts pool into one quota of 3 — the top scorers win
    assert sorted(sites["site.co.uk"]) == [0, 1, 2]
    # each blogspot subdomain keeps its own quota
    assert len(sites["a.blogspot.com"]) == 3
    assert len(sites["b.blogspot.com"]) == 3
    # helper columns dropped when keep_rank=False, passthrough preserved
    plain = CO.domain_quota(df, quota=3)
    assert plain.columns == ["doc_id", "host", "score"]


def test_domain_quota_rejects_bad_quota(spark):
    from web_crawler_spark.operators import corpus as CO

    df = spark.createDataFrame([(1, "a.com")], ["doc_id", "host"])
    with pytest.raises(ValueError):
        CO.domain_quota(df, quota=0)


def test_domain_graph_collapses_vhosts_drops_intra_site(spark):
    from web_crawler_spark.operators import graph as G

    rows = [
        # two vhosts of siteA link to siteB — must merge into ONE edge w=3
        ("www.a.co.uk", "b.com", 2),
        ("a.co.uk", "b.com", 1),
        # intra-site (vhost to apex) — self-loop after collapse, dropped
        ("www.a.co.uk", "a.co.uk", 5),
        # private-suffix subdomains stay separate nodes
        ("x.blogspot.com", "y.blogspot.com", 1),
    ]
    edges = spark.createDataFrame(rows, ["src_host", "dst_host", "n_links"])
    out = {
        (r.src_site, r.dst_site): r.n_links
        for r in G.domain_graph(edges).collect()
    }
    assert out == {
        ("a.co.uk", "b.com"): 3,
        ("x.blogspot.com", "y.blogspot.com"): 1,
    }


def _ref_psl(host, rules):
    """Independent pure-Python PSL reference (no shared code with the
    engine): linear scan of the rule list per host — the textbook
    formulation of the publicsuffix.org algorithm."""
    h = host.lower().rstrip(".")
    labels = h.split(".")
    n = len(labels)
    exc_ps = None
    best = 1
    for suffix, kind in rules:
        rl = suffix.split(".")
        k = len(rl)
        if labels[-k:] != rl or n < k:
            continue
        if kind == "exception":
            ps = k - 1
            if exc_ps is None or ps > exc_ps:
                exc_ps = ps
        elif kind == "wildcard":
            if n >= k + 1:
                best = max(best, k + 1)
        else:
            best = max(best, k)
    ps = exc_ps if exc_ps is not None else best
    # ps == 0 only from a 1-label exception rule (never in the real list):
    # the modified rule is the empty string, so the public suffix is ""
    # and the bare rule label itself is registrable — labels[-0:] is a
    # Python slice artifact, not the algorithm.
    public = ".".join(labels[-ps:]) if ps > 0 else ""
    reg = ".".join(labels[-(ps + 1):]) if n > ps else None
    return public, reg


def test_differential_random_rules_vs_pure_python(spark):
    """Differential test over seeded random rule sets and hosts — the same
    discipline test_portable_similarity applies: certification must not
    rest on the engine agreeing with itself."""
    import random

    alphabet = ["a", "b", "c", "xy"]
    for seed in range(5):
        rng = random.Random(1000 + seed)
        rules = []
        for _ in range(12):
            depth = rng.randint(1, 3)
            suffix = ".".join(rng.choice(alphabet) for _ in range(depth))
            kind = rng.choice(["normal", "normal", "wildcard", "exception"])
            rules.append((suffix, kind))
        # dedupe identical (suffix, kind) pairs; conflicting kinds on one
        # suffix are legal and exercise the per-key max fold
        rules = sorted(set(rules))
        text = "\n".join(
            ("!" if k == "exception" else "*." if k == "wildcard" else "") + s
            for s, k in rules
        )
        hosts = sorted(
            {
                ".".join(rng.choice(alphabet) for _ in range(rng.randint(1, 5)))
                for _ in range(120)
            }
        )
        df = spark.createDataFrame([(h,) for h in hosts], "host string")
        got = {
            r.host: (r.public_suffix, r.registrable_domain)
            for r in psl.with_registrable_domain(
                df, rules=psl.psl_rules_df(spark, text)
            ).collect()
        }
        for h in hosts:
            assert got[h] == _ref_psl(h, rules), (
                f"seed={seed} host={h} rules={rules}: "
                f"engine={got[h]} ref={_ref_psl(h, rules)}"
            )
