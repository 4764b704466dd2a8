"""a19_crawl_roi semantics via the registry at sf0.001: low-yield hosts
rank last, ratios exact."""

import __spark_entry__ as E


def test_roi_ranking(spark):
    rows = E.queries()["a19_crawl_roi"](spark, "/root/testdata/sf0.001").collect()
    assert rows
    # ratios recompute exactly
    for r in rows:
        assert r["tokens_per_mib"] == (
            r["tokens_extracted"] * 1048576 // r["bytes_fetched"]
        )
    # dense 1..n ranking ordered by ROI desc
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    rois = [r["tokens_per_mib"] for r in rows]
    assert rois == sorted(rois, reverse=True)
    # the three boilerplate hosts (user_id%15 < 3 -> ~10-token pages) are
    # the bottom three
    bottom = {r["host"] for r in rows[-3:]}
    assert bottom == {"h0", "h1", "h2"}
