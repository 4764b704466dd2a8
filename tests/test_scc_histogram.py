"""gr_scc_histogram: totals consistent with the node-level SCC table."""

import __spark_entry__ as E


def test_histogram_totals(spark):
    hist = E.queries()["gr_scc_histogram"](
        spark, "/root/testdata/sf0.001").collect()
    nodes = E.queries()["gr_scc"](spark, "/root/testdata/sf0.001").collect()
    assert sum(r["n_nodes"] for r in hist) == len(nodes)
    assert sum(r["n_components"] for r in hist) == len(
        {r["scc_id"] for r in nodes})
    # fixture has a dominant multi-node SCC and singleton fringe
    assert hist[0]["scc_size"] == 1 and hist[-1]["scc_size"] > 1
