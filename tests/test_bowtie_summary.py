"""gr_bowtie_summary: all six parts present on the certified fixture,
shares sum to ~1000."""

import __spark_entry__ as E


def test_parts_and_shares(spark):
    rows = E.queries()["gr_bowtie_summary"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    parts = {r["part"] for r in rows}
    assert parts == {"CORE", "IN", "OUT", "TUBE", "TENDRIL", "DISC"}
    total_share = sum(r["share_milli"] for r in rows)
    assert 990 <= total_share <= 1000          # floor rounding loses <1 each
    assert sum(r["n_nodes"] for r in rows) > 0
