"""split_leakage (operators/dedup.py): cross-split duplicate-pair audit
— combo normalization, doc-set counting, same-split suppression,
undirected/duplicate pair hygiene."""

from web_crawler_spark.operators import dedup as D


def _run(spark, assignments, pairs):
    a = spark.createDataFrame(assignments, "doc_id long, split string")
    p = spark.createDataFrame(pairs, "id_a long, id_b long")
    return {
        (r.split_a, r.split_b): (r.n_pairs, r.n_docs_a, r.n_docs_b)
        for r in D.split_leakage(a, p).collect()
    }


def test_combos_and_doc_sets(spark):
    assignments = [
        (1, "train"), (2, "train"), (3, "train"),
        (10, "test"), (11, "test"), (20, "valid"),
    ]
    pairs = [
        (1, 10), (2, 10), (3, 11),   # 3 test-train pairs, 2 test docs
        (2, 20),                      # train-valid
        (1, 2),                       # same split: suppressed
    ]
    got = _run(spark, assignments, pairs)
    assert got == {
        ("test", "train"): (3, 2, 3),
        ("train", "valid"): (1, 1, 1),
    }


def test_pair_direction_and_duplicates_collapse(spark):
    assignments = [(1, "train"), (9, "test")]
    pairs = [(1, 9), (9, 1), (1, 9), (5, 5)]   # mirrored+repeated+self
    assert _run(spark, assignments, pairs) == {("test", "train"): (1, 1, 1)}


def test_unassigned_ids_drop(spark):
    assignments = [(1, "train")]
    pairs = [(1, 99)]                           # 99 has no split row
    assert _run(spark, assignments, pairs) == {}


def test_canonical_cluster_conflicts(spark):
    pages = spark.createDataFrame(
        [
            # agree-cluster: both declare /c
            ("https://s.com/a1",
             '<html><head><link rel="canonical" href="/c"></head></html>'),
            ("https://s.com/a2",
             '<html><head><link rel="canonical" href="/c"></head></html>'),
            # conflict-cluster: members point at different targets
            ("https://s.com/b1",
             '<html><head><link rel="canonical" href="/x"></head></html>'),
            ("https://s.com/b2",
             '<html><head><link rel="canonical" href="/y"></head></html>'),
            # silent member does not conflict
            ("https://s.com/c1",
             '<html><head><link rel="canonical" href="/z"></head></html>'),
            ("https://s.com/c2", "<html><head></head></html>"),
            # singleton: excluded from the report
            ("https://s.com/solo",
             '<html><head><link rel="canonical" href="/q"></head></html>'),
        ],
        "url string, html string",
    )
    pairs = spark.createDataFrame(
        [
            ("https://s.com/a1", "https://s.com/a2"),
            ("https://s.com/b1", "https://s.com/b2"),
            ("https://s.com/c1", "https://s.com/c2"),
        ],
        "id_a string, id_b string",
    )
    got = {
        r.cluster_id: (
            r.n_pages, r.n_declaring, r.n_distinct_targets, r.conflicted
        )
        for r in D.canonical_cluster_conflicts(pages, pairs).collect()
    }
    assert got == {
        "https://s.com/a1": (2, 2, 1, False),
        "https://s.com/b1": (2, 2, 2, True),
        "https://s.com/c1": (2, 1, 1, False),
    }
