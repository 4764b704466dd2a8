"""shrinking_diameter (graph.py): the effective radius falls when later
epochs add shortcut structure to a chain."""

from web_crawler_spark.operators import graph as G


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "src_host string, dst_host string, epoch long"
    )


def test_radius_shrinks_with_added_shortcuts(spark):
    # epoch 0: 12-node bidirectional chain (large effective radius)
    chain = []
    for i in range(11):
        chain.append((f"n{i}", f"n{i+1}", 0))
        chain.append((f"n{i+1}", f"n{i}", 0))
    # epoch 1: hub connected to every node both ways (radius collapses)
    hub = []
    for i in range(12):
        hub.append(("hub", f"n{i}", 1))
        hub.append((f"n{i}", "hub", 1))
    out = {
        r["epoch"]: r
        for r in G.shrinking_diameter(
            _df(spark, chain + hub), cutoffs=[0, 1], rounds=6
        ).collect()
    }
    assert out[0]["effective_radius"] > out[1]["effective_radius"]
    assert out[1]["effective_radius"] <= 2
    # densified graph reaches at least as many pairs
    assert out[1]["nf_final_micro"] >= out[0]["nf_final_micro"]


def test_single_cutoff_matches_neighborhood_function(spark):
    pairs = [(f"n{i}", f"n{(i + 1) % 6}", 0) for i in range(6)]
    row = G.shrinking_diameter(_df(spark, pairs), cutoffs=[0],
                               rounds=5).collect()[0]
    nf = G.neighborhood_function(
        _df(spark, pairs).select("src_host", "dst_host"), rounds=5
    ).collect()
    eff = [r["r"] for r in nf if r["is_effective_radius"]][0]
    assert row["effective_radius"] == eff
    assert row["nf_final_micro"] == max(r["nf_micro"] for r in nf)
