"""allpairs_jaccard_join (operators/dedup.py): exact-threshold similarity
join with lossless prefix filtering — result must equal brute force
exactly (no missed pairs, no sub-threshold survivors)."""

from itertools import combinations

from web_crawler_spark.operators.dedup import allpairs_jaccard_join


def _brute(docs, t):
    sets = {i: set(s.split()) for i, s in docs if s.split()}
    out = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter == 0:
            continue
        j = inter / len(sets[a] | sets[b])
        if j >= t:
            out[(a, b)] = (inter, len(sets[a]), len(sets[b]), round(j, 6))
    return out


def _run(spark, docs, t):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return {
        (r.id_a, r.id_b): (r.n_common, r.size_a, r.size_b, r.jaccard)
        for r in allpairs_jaccard_join(df, threshold=t).collect()
    }


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "the quick brown fox leaps over the lazy dog"),
    (4, "completely different words entirely here now"),
    (5, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
    (6, ""),
    (7, "words different completely"),
]


def test_matches_brute_force_multiple_thresholds(spark):
    for t in (0.5, 0.7, 0.9):
        assert _run(spark, DOCS, t) == _brute(DOCS, t), t


def test_exact_dup_and_boundary(spark):
    got = _run(spark, DOCS, 0.99)
    assert got == {(1, 5): (8, 8, 8, 1.0)}


def test_pseudorandom_corpus(spark):
    # overlapping vocab slices: many near-threshold pairs exercise the
    # prefix bound tightly
    docs = [
        (i, " ".join(f"w{(i * 3 + k) % 40}" for k in range(12)))
        for i in range(24)
    ]
    for t in (0.4, 0.6, 0.8):
        assert _run(spark, docs, t) == _brute(docs, t), t
