"""gr_clustering_histogram: closed-form bands."""

import __spark_entry__ as E


def test_bands(spark):
    rows = {r["band_milli"]: r["n_nodes"] for r in
            E.queries()["gr_clustering_histogram"](
                spark, "/root/testdata/sf0.001").collect()}
    # ring(5) + path(4) + pendant = 10 at band 0; the triangle hub with
    # its pendant at 333; K5(5) + two pure triangle corners at 1000
    assert rows == {0: 10, 333: 1, 1000: 7}
