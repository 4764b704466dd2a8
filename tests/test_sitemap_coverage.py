"""crawl_sitemap_coverage via the registry: internal consistency + the
construction's containment property (crawled paths live in 100..599,
declared in 0..599, so every crawled-and-declared host has orphans only
when a crawled residue is missing from its declared set)."""

import __spark_entry__ as E


def test_coverage_consistency(spark):
    rows = E.queries()["crawl_sitemap_coverage"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0 < r["n_both"] <= min(r["n_declared"], r["n_crawled"])
        assert r["declared_coverage_milli"] == (
            1000 * r["n_both"] // r["n_declared"]
        )
        assert r["orphan_milli"] == (
            1000 * (r["n_crawled"] - r["n_both"]) // r["n_crawled"]
        )
        # coverage can't be total: residues 0..99 are never crawled
        assert r["declared_coverage_milli"] < 1000
