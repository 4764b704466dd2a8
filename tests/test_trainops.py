"""Training-data pipeline operators: dedup families, similarity search,
text analysis, multimodal plumbing."""

import math

import pytest
from pyspark.sql import functions as F

from web_crawler_spark.functions import text as T
from web_crawler_spark.functions import vectors as V
from web_crawler_spark.operators import dedup as D
from web_crawler_spark.operators import similarity as SIM

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog today"),
    (1, "the quick brown fox jumps over the lazy dog yesterday"),  # near-dup of 0
    (2, "completely different text about spark and data engines"),
    (3, "the quick brown fox jumps over the lazy dog today"),      # exact dup of 0
    (4, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_exact_dedup(docs):
    out = D.exact_dedup(docs)
    ids = {r["doc_id"] for r in out.collect()}
    assert 0 in ids and 3 not in ids  # survivor = min id
    assert ids == {0, 1, 2, 4}


def test_ngram_jaccard_finds_neardups(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in D.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()}
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0
    assert (0, 1) in pairs and 0.5 <= pairs[(0, 1)] < 1.0
    assert not any(2 in p for p in pairs)


def test_minhash_lsh_agrees_with_exact_on_dups(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in D.minhash_lsh_pairs(docs, n=3, k=16, bands=8, threshold=0.5).collect()}
    assert (0, 3) in pairs  # identical docs always share every band
    assert not any(2 in p for p in pairs)


def test_simhash_hamming(docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in D.simhash_dedup_pairs(docs, max_hamming=10).collect()}
    assert pairs.get((0, 3)) == 0  # exact dups → distance 0
    assert (0, 2) not in pairs


def ref_cosine(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))


def test_cosine_topk_exact(spark):
    import random

    rng = random.Random(9)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(200)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    q = vecs[0][1]
    got = SIM.cosine_topk(df, q, k=5).collect()
    # brute-force python oracle (float32 storage → compare on rounding)
    import numpy as np

    stored = [(i, np.array(v, dtype=np.float32).tolist()) for i, v in vecs]
    want = sorted(
        ((i, round(ref_cosine(v, q), 6)) for i, v in stored),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    assert [(r["vec_id"], r["cosine"]) for r in got] == [
        (i, pytest.approx(c, abs=2e-6)) for i, c in want
    ]
    assert got[0]["vec_id"] == 0 and got[0]["cosine"] == pytest.approx(1.0)


def test_lsh_topk_recall(spark):
    import random

    rng = random.Random(11)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(500)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>").cache()
    q = vecs[3][1]
    exact = [r["vec_id"] for r in SIM.cosine_topk(df, q, k=10).collect()]
    approx = [r["vec_id"] for r in SIM.lsh_topk(df, q, k=10, n_planes=3).collect()]
    # self-match always lands in the query's own bucket; recall is
    # statistical (16-dim gaussians, 8 buckets, rank-1 multiprobe → ~half
    # the space probed) — require a weak floor only
    assert exact[0] == 3 and approx[0] == 3
    assert len(set(exact) & set(approx)) >= 4


def test_token_counts(spark):
    df = spark.createDataFrame([("a b  c",), ("",), ("one-two 3",)], "text string")
    rows = df.select(
        T.token_count(F.col("text")).alias("n"),
        T.bpe_ish_token_count(F.col("text")).alias("b"),
    ).collect()
    assert [r["n"] for r in rows] == [3, 0, 2]
    # 'one-two 3' → [one][-][two][3]
    assert [r["b"] for r in rows] == [3, 0, 4]


def test_langid_stopwords(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog in the house",),
            ("der hund und die katze ist nicht da",),
            ("le chat et la maison est un lieu",),
            ("xyzzy qwerty asdf",),
        ],
        "text string",
    )
    got = [r["l"] for r in df.select(T.detect_language(F.col("text")).alias("l")).collect()]
    assert got == ["en", "de", "fr", "unknown"]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello,  World!",), ("hello world",)], "text string"
    )
    fps = [r["f"] for r in df.select(T.content_fingerprint(F.col("text")).alias("f")).collect()]
    assert fps[0] == fps[1]


def test_multimodal_plumbing(spark):
    from web_crawler_spark.multimodal.binaryops import (
        decode_image_stage,
        fake_feature_stage,
    )

    pages = spark.createDataFrame(
        [(f"u{i}", bytearray(b"\x89PNG" + bytes([i]) * 8)) for i in range(10)],
        "url string, payload binary",
    )
    feats = fake_feature_stage(pages).collect()
    assert len(feats) == 10
    assert all(len(r["features"]) == 8 for r in feats)
    with pytest.raises(Exception):
        decode_image_stage(pages).collect()  # stub raises NotImplementedError


def test_dataset_split_deterministic_and_leak_free(spark):
    from pyspark.sql import functions as F

    from web_crawler_spark.functions import sampling as SP

    d = spark.range(0, 5000).select(F.col("id").alias("doc_id"))
    s1 = SP.dataset_split(d, "doc_id", train=0.8, val=0.1)
    s2 = SP.dataset_split(d, "doc_id", train=0.8, val=0.1)
    # identical membership on re-run (no rand())
    assert s1.exceptAll(s2).count() == 0
    counts = {r["split"]: r["n"] for r in s1.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    # hash-percentile fractions are approximate at finite n, exact over buckets
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02

    samp = SP.stratified_sample(
        d.withColumn("lang", (F.col("doc_id") % 3).cast("string")),
        "lang", 0.2, "doc_id",
    )
    again = SP.stratified_sample(
        d.withColumn("lang", (F.col("doc_id") % 3).cast("string")),
        "lang", 0.2, "doc_id",
    )
    assert samp.exceptAll(again).count() == 0  # same keys survive every run
    per = {r["lang"]: r["n"] for r in samp.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in per.items():
        assert abs(n / (5000 / 3) - 0.2) < 0.05, (lang, n)


def test_pii_scrub_and_contamination(spark):
    from pyspark.sql import functions as F

    from web_crawler_spark.functions import text as T

    df = spark.createDataFrame(
        [
            ("mail bob.smith+x@corp.example.org end",),
            ("call +44 020-555-1234 now",),
            ("host 192.168.0.1 up, not 1234.5 or a.b.c.d",),
            ("clean text stays untouched",),
        ],
        "t string",
    )
    got = [r["s"] for r in df.select(T.scrub_pii(F.col("t")).alias("s")).collect()]
    assert got[0] == "mail <EMAIL> end"
    assert got[1] == "call <PHONE> now"
    assert got[2] == "host <IPV4> up, not 1234.5 or a.b.c.d"
    assert got[3] == "clean text stays untouched"

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight again"),
            (2, "completely unrelated words about markets and gold prices today ok"),
            (3, "we saw the quick brown fox jumps over the lazy dog tonight too"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("benchmark says the quick brown fox jumps over the lazy dog tonight",)],
        "text string",
    )
    hit = sorted(
        r["doc_id"] for r in T.contaminated_doc_ids(docs, bench, n=8).collect()
    )
    assert hit == [1, 3]  # doc 2 shares no 8-gram with the benchmark
