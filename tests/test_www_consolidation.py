"""url_www_consolidation: pairing semantics and flag arithmetic."""

import __spark_entry__ as E


def test_pairing_and_flag(spark):
    rows = E.queries()["url_www_consolidation"](
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert not r["apex"].startswith("www.")
        assert r["split_identity"] == (
            r["n_apex_urls"] > 0 and r["n_www_urls"] > 0
        )
        assert r["n_apex_urls"] + r["n_www_urls"] > 0
    # at least one split identity exists in the fixture
    assert any(r["split_identity"] for r in rows)
