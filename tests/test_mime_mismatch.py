"""url_mime_mismatch audit classes via the registry at sf0.001."""

import __spark_entry__ as E


def test_mismatch_classes(spark):
    rows = E.queries()["url_mime_mismatch"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "fixture produced no rows"
    for r in rows:
        did = int(r["url"].split("/f")[1].split(".")[0])
        want_sniff = "image/png" if did % 2 == 0 else "text/html"
        assert r["sniffed_mime"] == want_sniff
        assert r["mismatch"] == (r["sniffed_mime"] != r["expected_mime"])
    # every .gif row mismatches (no gif bodies exist)
    gifs = [r for r in rows if r["ext"] == ".gif"]
    assert gifs and all(r["mismatch"] for r in gifs)
    # matched classes exist too
    assert any(not r["mismatch"] for r in rows)
