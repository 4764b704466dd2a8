"""url_query_key_stats: the three planted params with construction
frequencies; share arithmetic."""

import __spark_entry__ as E


def test_param_census(spark):
    rows = {r["param"]: r for r in E.queries()["url_query_key_stats"](
        spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) == {"page", "utm_source", "sid"}
    page, utm, sid = rows["page"], rows["utm_source"], rows["sid"]
    # page on every URL, utm on ~half, sid on ~1/7
    assert page["n_urls"] > utm["n_urls"] > sid["n_urls"]
    assert page["url_share_milli"] == 1000
    assert 0 < sid["url_share_milli"] < utm["url_share_milli"] < 1000
    for r in rows.values():
        assert 1 <= r["n_hosts"] <= 23
