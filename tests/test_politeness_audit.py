"""f3_politeness_audit semantics: planted violators flagged, clean hosts
zero, rates exact."""

import __spark_entry__ as E


def test_violation_accounting(spark):
    rows = E.queries()["f3_politeness_audit"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by = {r["host"]: r for r in rows}
    assert set(by) == {f"h{i}" for i in range(10)}
    for h, r in by.items():
        i = int(h[1:])
        if i < 2:
            # every 7th gap violates: floor((n-1)/7)... exactly the
            # count of seq in [2, n] with seq % 7 == 0
            expect = sum(
                1 for s in range(2, r["n_fetches"] + 1) if s % 7 == 0
            )
            assert r["n_violations"] == expect > 0
            assert r["worst_gap_ms"] == 500
        else:
            assert r["n_violations"] == 0
            assert r["worst_gap_ms"] >= 2000
        assert r["violation_milli"] == (
            1000 * r["n_violations"] // (r["n_fetches"] - 1)
        )
