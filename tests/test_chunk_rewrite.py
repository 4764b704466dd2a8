"""remove_duplicate_chunks (operators/corpus.py): sub-document dedup that
rewrites documents. Toy corpus with 2-word chunks so instances are easy to
enumerate by hand."""

from web_crawler_spark.operators import corpus as C


def _rows(df):
    return {r.doc_id: (r.clean_text, r.n_chunks, r.n_removed) for r in df.collect()}


def test_keep_first_cuts_later_instances_only(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # chunks: "a b", "c d" — both first
            (2, "a b x y"),          # "a b" dup (cut), "x y" first
            (3, "a b c d"),          # fully recycled -> ''
            (4, ""),                 # empty text preserved
        ],
        ["doc_id", "text"],
    )
    out = _rows(C.remove_duplicate_chunks(docs, chunk_words=2))
    assert out[1] == ("a b c d", 2, 0)
    assert out[2] == ("x y", 2, 1)
    assert out[3] == ("", 2, 2)
    assert out[4] == ("", 0, 0)


def test_drop_common_kills_boilerplate_everywhere(spark):
    docs = spark.createDataFrame(
        [(i, f"nav bar u{i} v{i}") for i in range(1, 5)],  # "nav bar" df=4
        ["doc_id", "text"],
    )
    out = _rows(C.remove_duplicate_chunks(docs, chunk_words=2, policy="drop_common", max_df=1))
    # the boilerplate chunk is cut from EVERY doc, including the first
    assert all(out[i] == (f"u{i} v{i}", 2, 1) for i in range(1, 5))


def test_odd_length_partial_last_chunk(spark):
    docs = spark.createDataFrame([(1, "a b c"), (2, "p q c")], ["doc_id", "text"])
    out = _rows(C.remove_duplicate_chunks(docs, chunk_words=2))
    # partial last chunks ("c") dedup like any chunk: doc 2 loses its "c"
    assert out[1] == ("a b c", 2, 0)
    assert out[2] == ("p q", 2, 1)


def _cdc_python(b: bytes, mask_bits=5, min_size=24, mult=11400714819323198485):
    # independent reference: the SEQUENTIAL gear recurrence h = 2h + G[b]
    # mod 2^64 (the kernel uses the 64-shift vectorized form instead —
    # parity across the two formulations is the point of this test)
    M = 1 << 64
    h, cand = 0, []
    for i, byte in enumerate(b):
        h = (2 * h + ((byte + 1) * mult) % M) % M
        if h % (1 << mask_bits) == 0:
            cand.append(i + 1)
    cuts = [0]
    for p in cand:
        if p - cuts[-1] >= min_size:
            cuts.append(p)
    if cuts[-1] != len(b):
        cuts.append(len(b))
    import hashlib
    return [
        (ci, cuts[ci], cuts[ci + 1] - cuts[ci],
         hashlib.md5("-".join(str(x) for x in b[cuts[ci]:cuts[ci + 1]]).encode()).hexdigest())
        for ci in range(len(cuts) - 1)
    ]


def _cdc_bytes(seed: int, n: int) -> bytes:
    return bytes((seed * 7 + j * 13 + (j * j) % 251) % 256 for j in range(n))


def test_cdc_matches_sequential_reference(spark):
    from web_crawler_spark.operators.dedup import cdc_chunks

    payloads = [(i, _cdc_bytes(i, 150 + 37 * i)) for i in range(6)]
    df = spark.createDataFrame(payloads, "doc_id bigint, payload binary")
    got = cdc_chunks(df).orderBy("doc_id", "chunk_idx").collect()
    want = {
        i: _cdc_python(b) for i, b in payloads
    }
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["start"], r["length"], r["chunk_hash"])
        )
    assert by_doc == want


def test_cdc_boundaries_resync_after_insertion(spark):
    # THE content-defined property (LBFS): inserting bytes near the front
    # shifts every offset, yet chunking resyncs at the first shared
    # content-defined cut — the chunk-hash sequence shares a long
    # identical suffix, so storage dedup still matches everything
    # downstream of the edit. Offset-based chunking would share nothing.
    from web_crawler_spark.operators.dedup import cdc_chunks

    base = _cdc_bytes(3, 2000)
    edited = base[:10] + b"\x42\x43\x44" + base[10:]
    df = spark.createDataFrame(
        [(0, base), (1, edited)], "doc_id bigint, payload binary"
    )
    rows = cdc_chunks(df).orderBy("doc_id", "chunk_idx").collect()
    h0 = [r["chunk_hash"] for r in rows if r["doc_id"] == 0]
    h1 = [r["chunk_hash"] for r in rows if r["doc_id"] == 1]
    assert len(h0) > 10
    suffix = 0
    while suffix < min(len(h0), len(h1)) and h0[-1 - suffix] == h1[-1 - suffix]:
        suffix += 1
    # all but the chunks overlapping the 13-byte edit region resync
    assert suffix >= len(h0) - 3


def test_cdc_partition_invariants_and_nulls(spark):
    from web_crawler_spark.operators.dedup import cdc_chunks

    df = spark.createDataFrame(
        [(0, _cdc_bytes(9, 500)), (1, None), (2, b""), (3, _cdc_bytes(4, 10))],
        "doc_id bigint, payload binary",
    )
    rows = cdc_chunks(df, min_size=24).orderBy("doc_id", "chunk_idx").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {0, 3}  # null and empty payloads null-route
    # chunks tile the payload exactly, in order
    pos = 0
    for r in by_doc[0]:
        assert r["start"] == pos
        pos += r["length"]
    assert pos == 500
    # every non-tail chunk honors min_size; tail may be short but exists
    for r in by_doc[0][:-1]:
        assert r["length"] >= 24
    # payload shorter than min_size -> one whole-payload chunk
    assert len(by_doc[3]) == 1 and by_doc[3][0]["length"] == 10


def test_cdc_dedup_stats_content_addressing(spark):
    from web_crawler_spark.operators.dedup import cdc_chunks, cdc_dedup_stats

    # 3 copies of one payload + 1 distinct: duplicate payloads produce
    # identical chunk hashes, so unique_bytes counts one copy's bytes
    a, b = _cdc_bytes(5, 600), _cdc_bytes(8, 500)
    df = spark.createDataFrame(
        [(0, a), (1, a), (2, a), (3, b)], "doc_id bigint, payload binary"
    )
    got = cdc_dedup_stats(cdc_chunks(df)).collect()[0]
    assert got["total_bytes"] == 3 * 600 + 500
    assert got["unique_bytes"] == 600 + 500
    assert got["n_chunks"] == 3 * (got["n_unique_chunks"]
                                   - _n_chunks_of(spark, b)) + _n_chunks_of(spark, b)
    assert got["stored_ratio_milli"] == (1000 * 1100) // 2300


def _n_chunks_of(spark, payload):
    from web_crawler_spark.operators.dedup import cdc_chunks

    df = spark.createDataFrame([(0, payload)], "doc_id bigint, payload binary")
    return cdc_chunks(df).count()


def test_cdc_dedup_stats_empty(spark):
    from web_crawler_spark.operators.dedup import cdc_chunks, cdc_dedup_stats

    df = spark.createDataFrame([], "doc_id bigint, payload binary")
    got = cdc_dedup_stats(cdc_chunks(df)).collect()[0]
    assert got["n_chunks"] == 0 and got["total_bytes"] == 0
    assert got["stored_ratio_milli"] is None
