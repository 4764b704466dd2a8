"""x_page_meta via the registry: attribute-order independence, canonical
presence classes, title normalization."""

import __spark_entry__ as E


def test_page_meta_classes(spark):
    rows = E.queries()["x_page_meta"](spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        did = int(r["url"].rsplit("/", 1)[1])
        assert r["title"] == f"Doc {did} | Site"
        if did % 2 == 0:
            assert r["description"] == f"Summary {did % 13}"
        else:
            # content-before-name attribute order parses identically
            assert r["description"] == f"Alt {did % 7}"
        if did % 3 == 0:
            assert r["canonical"] == f"https://c.example.com/{did}"
        else:
            assert r["canonical"] is None
