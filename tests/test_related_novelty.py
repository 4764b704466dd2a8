"""related_hosts (co-citation / bibliographic coupling), per-doc TF-IDF
keywords and per-epoch content-novelty accounting — hand-computed micro
fixtures, hub-cap and tie-break semantics, empty/NULL edges."""

import math

import pytest

from web_crawler_spark.operators.corpus import epoch_novelty, tfidf_keywords
from web_crawler_spark.operators.graph import related_hosts


def _edges(spark, pairs):
    return spark.createDataFrame(
        list(pairs), "src_host string, dst_host string"
    )


def test_cocitation_hand_computed(spark):
    # in-link sets over the capped key set: A <- {k1,k2,k3}, B <- {k1,k2},
    # C <- {k2,k3}; duplicates of (k1,A) must collapse before counting.
    e = _edges(spark, [
        ("k1", "A"), ("k1", "A"), ("k1", "B"),
        ("k2", "A"), ("k2", "B"), ("k2", "C"),
        ("k3", "A"), ("k3", "C"),
    ])
    rows = {(r["host_a"], r["host_b"]): r for r in related_hosts(
        e, mode="cocitation", max_degree=10, min_shared=1
    ).collect()}
    ab = rows[("A", "B")]
    assert (ab["shared"], ab["deg_a"], ab["deg_b"]) == (2, 3, 2)
    assert ab["jaccard_milli"] == math.floor(1000 * 2 / (3 + 2 - 2))  # 666
    ac = rows[("A", "C")]
    assert (ac["shared"], ac["jaccard_milli"]) == (2, 666)
    bc = rows[("B", "C")]
    assert (bc["shared"], bc["jaccard_milli"]) == (1, 333)  # 1/(2+2-1)


def test_cocitation_hub_cap_drops_key(spark):
    # hub key h links 3 targets; cap 2 removes it entirely: its votes AND
    # its contribution to the Jaccard denominators both disappear.
    e = _edges(spark, [
        ("h", "A"), ("h", "B"), ("h", "C"),
        ("k", "A"), ("k", "B"),
    ])
    rows = related_hosts(e, mode="cocitation", max_degree=2, min_shared=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["host_a"], r["host_b"], r["shared"]) == ("A", "B", 1)
    assert (r["deg_a"], r["deg_b"], r["jaccard_milli"]) == (1, 1, 1000)


def test_coupling_swaps_roles(spark):
    # coupling keys by the TARGET: s1,s2 both link t1,t2 -> shared=2.
    e = _edges(spark, [
        ("s1", "t1"), ("s1", "t2"), ("s2", "t1"), ("s2", "t2"), ("s3", "t2"),
    ])
    rows = {(r["host_a"], r["host_b"]): r for r in related_hosts(
        e, mode="coupling", max_degree=10, min_shared=1
    ).collect()}
    assert rows[("s1", "s2")]["shared"] == 2
    assert rows[("s1", "s2")]["jaccard_milli"] == 1000
    assert rows[("s1", "s3")]["shared"] == 1
    assert ("s2", "s1") not in rows  # canonical host_a < host_b


def test_related_hosts_min_shared_and_bad_mode(spark):
    e = _edges(spark, [("k1", "A"), ("k1", "B"), ("k2", "A"), ("k2", "B")])
    assert related_hosts(e, mode="cocitation", max_degree=9, min_shared=3).count() == 0
    with pytest.raises(ValueError):
        related_hosts(e, mode="similar")


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_tfidf_keywords_hand_computed(spark):
    # N=3 docs; "common" in all 3 (idf=ln(1)=0), "rare" only in doc0.
    d = _docs(spark, [
        "common rare rare",
        "common alpha",
        "common alpha beta",
    ])
    rows = tfidf_keywords(d, k=2).orderBy("doc_id", "rank").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    r0 = by_doc[0][0]
    assert r0["term"] == "rare" and r0["tf"] == 2
    assert r0["score"] == pytest.approx(2.0 * math.log(3.0 / 1.0))
    # ubiquitous term scores exactly 0 and loses to any informative term
    assert by_doc[0][1]["term"] == "common" and by_doc[0][1]["score"] == 0.0
    # doc2: beta (df=1, score ln 3) outranks alpha (df=2, score ln 1.5)
    assert by_doc[2][0]["term"] == "beta"
    assert by_doc[2][0]["score"] == pytest.approx(math.log(3.0))
    assert by_doc[2][1]["term"] == "alpha"
    assert by_doc[2][1]["score"] == pytest.approx(math.log(3.0 / 2.0))


def test_tfidf_tie_breaks_by_term_and_k(spark):
    # alpha and beta tie exactly (same tf, same df) -> term asc wins rank 1
    d = _docs(spark, ["beta alpha", "alpha beta"])
    rows = tfidf_keywords(d, k=1).orderBy("doc_id").collect()
    assert [r["term"] for r in rows] == ["alpha", "alpha"]
    assert all(r["rank"] == 1 for r in rows)


def test_tfidf_empty_and_blank_docs(spark):
    assert tfidf_keywords(_docs(spark, [])).count() == 0
    rows = tfidf_keywords(_docs(spark, ["   ", "only doc"])).collect()
    assert {r["doc_id"] for r in rows} == {1}  # blank doc tokenless, excluded


def _pages(spark, rows):
    return spark.createDataFrame(list(rows), "epoch long, fingerprint string")


def test_epoch_novelty_hand_computed(spark):
    p = _pages(spark, [
        (0, "a"), (0, "a"), (0, "b"),          # epoch 0: all novel
        (1, "a"), (1, "c"),                     # epoch 1: a reseen, c novel
        (2, "a"), (2, "b"), (2, "c"), (2, "d"),  # epoch 2: only d novel
    ])
    rows = {r["epoch"]: r for r in epoch_novelty(p).collect()}
    e0 = rows[0]
    assert (e0["fetches"], e0["distinct_fps"], e0["novel_fps"]) == (3, 2, 2)
    assert e0["novelty_milli"] == 1000
    e1 = rows[1]
    assert (e1["fetches"], e1["distinct_fps"], e1["novel_fps"]) == (2, 2, 1)
    assert e1["novelty_milli"] == 500
    e2 = rows[2]
    assert (e2["fetches"], e2["distinct_fps"], e2["novel_fps"]) == (4, 4, 1)
    assert e2["novelty_milli"] == 250


def test_epoch_novelty_null_fp_and_empty(spark):
    p = spark.createDataFrame(
        [(0, "a"), (0, None), (1, None)], "epoch long, fingerprint string"
    )
    rows = epoch_novelty(p).collect()
    # NULL fingerprints are dropped entirely: epoch 1 has no surviving rows
    assert len(rows) == 1 and rows[0]["epoch"] == 0 and rows[0]["fetches"] == 1
    assert epoch_novelty(_pages(spark, [])).count() == 0
