"""dd_cluster_size_histogram: planted cluster structure recovered."""

import __spark_entry__ as E


def test_histogram_shape(spark):
    rows = E.queries()["dd_cluster_size_histogram"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by = {r["cluster_size"]: r for r in rows}
    # only odd event_ids create a real pair (even ones self-loop and
    # drop): d{k} <-> d{k+50} for odd k -> 25 clusters of size 2, plus
    # the 12-doc mega chain
    assert by[2]["n_clusters"] == 25 and by[2]["n_docs"] == 50
    assert by[12]["n_clusters"] == 1 and by[12]["n_docs"] == 12
    assert sum(r["n_docs"] for r in rows) == 62
