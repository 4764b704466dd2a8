"""url_www_consolidation: the three identity classes from the fixture."""

import __spark_entry__ as E


def test_identity_classes(spark):
    rows = E.queries()["url_www_consolidation"](
        spark, "/root/testdata/sf0.001").collect()
    ex = [r for r in rows if r["apex"].endswith(".example.org")]
    sp = [r for r in rows if r["apex"].endswith(".split.org")]
    assert ex and sp
    for r in ex:
        # apex-only and www-only sources merge under one apex: both
        # columns populated because doc_id%3 classes 0 AND 1 exist per
        # source -> split identity there too
        assert r["n_apex_urls"] > 0 and r["n_www_urls"] > 0
    for r in sp:
        assert r["split_identity"]
        assert r["n_apex_urls"] > 0 and r["n_www_urls"] > 0
