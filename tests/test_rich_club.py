"""gr_rich_club: closed-form phi on the registry fixture + monotone
membership."""

import __spark_entry__ as E


def test_rich_club_structure(spark):
    rows = E.queries()["gr_rich_club"](spark, "/root/testdata/sf0.001").collect()
    assert [r["k"] for r in rows] == [1, 2, 4, 8, 16]
    n = [r["n_rich"] for r in rows]
    e = [r["e_rich"] for r in rows]
    # raising k can only shrink the club and its internal edge set
    assert n == sorted(n, reverse=True)
    assert e == sorted(e, reverse=True)
    for r in rows:
        if r["n_rich"] >= 2:
            assert 0.0 <= r["phi"] <= 1.0
            assert r["e_rich"] <= r["n_rich"] * (r["n_rich"] - 1) // 2
        else:
            assert r["phi"] is None
