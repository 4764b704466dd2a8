"""Feature-hashing TF-IDF embedding tests (functions/hashembed.py)."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pytest

from web_crawler_spark.functions import hashembed as HE

DIM = 16


def _py_embed(texts: dict[int, str], dim: int = DIM) -> dict[int, list[float]]:
    """Independent reference implementation."""
    n = len(texts)

    def bucket(w):
        return int(hashlib.md5(f"hembed:{w}".encode()).hexdigest()[:4], 16) % dim

    def sign(w):
        b = int(hashlib.md5(f"hembed-sign:{w}".encode()).hexdigest()[:1], 16) % 2
        return 1 if b == 0 else -1

    per_doc: dict[int, dict[int, int]] = {}
    bucket_docs: dict[int, set[int]] = {}
    for i, t in texts.items():
        tf: dict[str, int] = {}
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            tf[w] = tf.get(w, 0) + 1
        comps: dict[int, int] = {}
        for w, c in tf.items():
            b = bucket(w)
            comps[b] = comps.get(b, 0) + sign(w) * c
            bucket_docs.setdefault(b, set()).add(i)
        per_doc[i] = comps

    idf = {
        b: math.floor(math.log((n + 1.0) / (len(d) + 1.0)) * HE.IDF_FP)
        for b, d in bucket_docs.items()
    }
    out = {}
    for i, comps in per_doc.items():
        raw = [comps.get(b, 0) * idf.get(b, 0) for b in range(dim)]
        ss = sum(x * x for x in raw)
        if ss == 0:
            continue
        nrm = math.sqrt(float(ss))
        out[i] = [x / nrm for x in raw]
    return out


TEXTS = {
    0: "the quick brown fox jumps over the lazy dog",
    1: "the quick brown fox",
    2: "revenue growth quarterly report earnings",
    3: "",  # wordless → omitted
    4: "fox fox fox fox dog",
}


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.createDataFrame(list(TEXTS.items()), ["doc_id", "text"])
    return {
        r["doc_id"]: list(r["embedding"])
        for r in HE.hash_embed(df, dim=DIM).collect()
    }


def test_matches_independent_python(emb):
    want = _py_embed(TEXTS)
    assert set(emb) == set(want)  # doc 3 omitted by both
    for i in want:
        assert emb[i] == pytest.approx(want[i], abs=0.0), i  # bit-identical


def test_unit_norm(emb):
    for i, v in emb.items():
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-12)


def test_similar_docs_closer_than_dissimilar(emb):
    def cos(a, b):
        return float(np.dot(a, b))

    # fox docs vs each other > fox docs vs finance doc
    assert cos(emb[0], emb[1]) > cos(emb[0], emb[2])
    assert cos(emb[1], emb[4]) > cos(emb[1], emb[2])


def test_idf_join_is_broadcast(spark):
    df = spark.createDataFrame(list(TEXTS.items()), ["doc_id", "text"])
    plan = HE.hash_embed(df, dim=DIM)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # dim-row idf side never shuffles
