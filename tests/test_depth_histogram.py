"""gr_depth_histogram: binary-tree layer counts + chain + shortcut."""

import __spark_entry__ as E


def test_layers(spark):
    rows = {r["depth"]: r for r in E.queries()["gr_depth_histogram"](
        spark, "/root/testdata/sf0.001").collect()}
    # depth 0: seed. depth 1: n1, n2, n62 (shortcut), n1000 -> 4
    assert rows[0]["n_nodes"] == 1
    assert rows[1]["n_nodes"] == 4
    # tree layer 2 (4 nodes) + chain n1001 -> 5
    assert rows[2]["n_nodes"] == 5
    # cumulative is monotone and consistent
    cum = 0
    for d in sorted(rows):
        cum += rows[d]["n_nodes"]
        assert rows[d]["cum_nodes"] == cum
    assert max(rows) == 8  # the max_depth cap
