"""tx_corpus_funnel: monotone attrition, planted-duplicate sensitivity."""

import __spark_entry__ as E


def test_funnel_monotone(spark):
    rows = E.queries()["tx_corpus_funnel"](
        spark, "/root/testdata/sf0.001").collect()
    assert [r["stage"] for r in rows] == ["all", "exact_dedup",
                                          "gopher_pass"]
    docs = [r["n_docs"] for r in rows]
    toks = [r["n_tokens"] for r in rows]
    assert docs[0] >= docs[1] >= docs[2] > 0
    assert toks[0] >= toks[1] >= toks[2] > 0
    assert rows[0]["doc_share_milli"] == 1000
    for r in rows:
        assert r["doc_share_milli"] == 1000 * r["n_docs"] // docs[0]
