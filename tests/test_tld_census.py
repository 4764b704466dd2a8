"""url_tld_census: suffix classes from the PSL fixture present with
consistent shares."""

import __spark_entry__ as E


def test_census(spark):
    rows = {r["public_suffix"]: r for r in E.queries()["url_tld_census"](
        spark, "/root/testdata/sf0.001").collect()}
    # the fixture's rule classes all appear
    assert "co.uk" in rows            # registry multi-label (+ bare suffix)
    assert "github.io" in rows        # private suffix
    assert "blogspot.com" in rows     # private suffix, deep label
    assert any(s and s.endswith("ck") for s in rows if s)  # wildcard *.ck
    total = sum(r["n_hosts"] for r in rows.values())
    assert total > 0
    for r in rows.values():
        assert 0 <= r["share_milli"] <= 1000
