"""Cross-document template detection / per-page template burden
(Gibson-Punera-Tomkins site-frequency boilerplate) and deletion-
neighborhood host lookalikes — hand-computed fixtures, threshold and
gate semantics, distance-2 rejection."""

import pytest

from web_crawler_spark.operators.boilerplate import host_templates, template_burden
from web_crawler_spark.operators.urlfilter import host_lookalikes


def _pages(spark, rows):
    return spark.createDataFrame(
        list(rows), "host string, url string, text string"
    )


def _fleet(host, n, promo_every=2):
    # n pages: nav+footer everywhere, promo on every promo_every-th page,
    # unique content per page
    out = []
    for i in range(n):
        lines = [f"nav-{host}", "footer"]
        if i % promo_every == 0:
            lines.append("promo")
        lines.append(f"content-{i}")
        out.append((host, f"https://{host}/p{i}", "\n".join(lines)))
    return out


def test_host_templates_threshold_and_min_pages(spark):
    rows = _fleet("a.com", 4) + _fleet("b.com", 2)
    t = host_templates(_pages(spark, rows), min_pages=3, frac_milli=600).collect()
    hosts = {r["host"] for r in t}
    assert hosts == {"a.com"}  # b.com has 2 pages < min_pages
    by = {(r["host"], r["n_docs"]) for r in t}
    # nav + footer on all 4 pages; promo on 2/4 = 500 < 600 excluded
    assert by == {("a.com", 4), ("a.com", 4)} or len(t) == 2
    assert all(r["n_pages"] == 4 and r["n_docs"] == 4 for r in t)


def test_host_templates_repeat_counts_once(spark):
    # a page repeating its nav line 3x still votes once
    rows = [
        ("a.com", "u1", "nav\nnav\nnav\nx1"),
        ("a.com", "u2", "nav\nx2"),
        ("a.com", "u3", "nav\nx3"),
    ]
    t = host_templates(_pages(spark, rows), min_pages=3, frac_milli=1000).collect()
    assert len(t) == 1 and t[0]["n_docs"] == 3


def test_template_burden_hand_computed(spark):
    rows = _fleet("a.com", 4)
    b = {
        r["url"]: r
        for r in template_burden(
            _pages(spark, rows), min_pages=3, frac_milli=600
        ).collect()
    }
    even = b["https://a.com/p0"]  # nav, footer, promo, content -> 4 lines
    assert (even["n_lines"], even["n_template"], even["burden_milli"]) == (4, 2, 500)
    odd = b["https://a.com/p1"]  # nav, footer, content -> 3 lines
    assert (odd["n_lines"], odd["n_template"], odd["burden_milli"]) == (3, 2, 666)


def test_template_burden_small_host_zero(spark):
    # below min_pages no line is template -> burden 0 everywhere
    b = template_burden(
        _pages(spark, _fleet("b.com", 2)), min_pages=3, frac_milli=600
    ).collect()
    assert b and all(r["burden_milli"] == 0 for r in b)


def _hosts(spark, names):
    return spark.createDataFrame([(n,) for n in names], "host string")


def test_lookalikes_all_single_edit_kinds(spark):
    got = {
        (r["host_a"], r["host_b"]): r["dist"]
        for r in host_lookalikes(
            _hosts(spark, ["shop.com", "shoop.com", "sh0p.com", "shp.com",
                           "unrelated.org"])
        ).collect()
    }
    assert got[("shoop.com", "shop.com")] == 1   # insertion
    assert got[("sh0p.com", "shop.com")] == 1    # substitution
    assert got[("shop.com", "shp.com")] == 1     # deletion
    assert got[("sh0p.com", "shp.com")] == 1     # deletion of the 0
    # distance-2 collisions admitted by the deletion join must be gone
    assert ("sh0p.com", "shoop.com") not in got
    assert ("shoop.com", "shp.com") not in got
    assert not any("unrelated.org" in p for p in got)


def test_lookalikes_identical_and_short_hosts(spark):
    # duplicates collapse (no self-pair); short hosts generate nothing
    got = host_lookalikes(
        _hosts(spark, ["abc", "abd", "shop.com", "shop.com"])
    ).collect()
    assert got == []


def test_lookalikes_hot_variant_cap(spark):
    # 5 hosts all sharing variant 'aaaa' (one char appended); cap 3 drops
    # the bucket entirely -> only pairs via OTHER variants survive; with
    # these hosts every candidate route goes through a capped bucket
    names = ["aaaax", "aaaay", "aaaaz", "aaaaw", "aaaav"]
    paired = host_lookalikes(_hosts(spark, names), max_bucket=3).collect()
    assert paired == []
    # sanity: without the cap they all pair up via the shared deletion
    full = host_lookalikes(_hosts(spark, names), max_bucket=64).collect()
    assert len(full) == 10  # C(5,2), each dist... substitution = 1
    assert all(r["dist"] == 1 for r in full)


def test_dom_template_families_grouping(spark):
    """x_dom_template_families: within-family pairs survive the structural
    tag-Jaccard threshold, cross-family pairs never appear."""
    import __spark_entry__ as E

    rows = E._q_dom_template_families(spark, "/root/testdata/sf0.001").collect()
    assert rows, "expected within-family structural pairs"
    for r in rows:
        assert r["id_a"] % 3 == r["id_b"] % 3, "cross-family pair leaked"
        assert r["jaccard"] >= 0.5
    # identical-structure pairs (same jitter class) must score exactly 1.0
    same = [r for r in rows if (r["id_a"] % 7 == 0) == (r["id_b"] % 7 == 0)]
    assert same and all(r["jaccard"] == 1.0 for r in same)
