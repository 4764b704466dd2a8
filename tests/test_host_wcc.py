"""gr_host_wcc query shape at sf0.001: component structure + giant flag
tie-break semantics."""

import __spark_entry__ as E


def test_components_and_giant_flag(spark):
    rows = E.queries()["gr_host_wcc"](spark, "/root/testdata/sf0.001").collect()
    by = {r["component"]: r for r in rows}
    # giant 40-chain + three 5-host islands + isolated pair
    sizes = sorted(r["n_hosts"] for r in rows)
    assert sizes == [2, 5, 5, 5, 40]
    giants = [r for r in rows if r["is_giant"]]
    assert len(giants) == 1 and giants[0]["n_hosts"] == 40
    assert giants[0]["component"] == "g0"
    assert by["z0"]["n_hosts"] == 2 and not by["z0"]["is_giant"]
