"""fineweb_line_quality + pack_efficiency (operators/corpus.py): line-level
quality flags with hand-computed fixtures; packing-efficiency rollup
consistency against the pack_sequences plan it aggregates."""

from web_crawler_spark.operators import corpus as C


def test_fineweb_line_quality_hand_computed(spark):
    rows = [
        # 3 lines, all punct-terminated, none short(<30), no dups
        (1, "This is a long enough sentence one.\n"
            "Another long enough sentence two.\n"
            "And a third long enough sentence."),
        # nav-menu shape: 4 lines, no punct, all short, one line repeated
        (2, "Home\nProducts\nHome\nContact"),
        # empty doc -> one empty line
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in C.fineweb_line_quality(df).collect()}

    r1 = out[1]
    assert r1["n_lines"] == 3 and r1["n_punct_lines"] == 3
    assert r1["n_short_lines"] == 0 and r1["n_dup_lines"] == 0
    assert r1["flag_pass"]

    r2 = out[2]
    assert r2["n_lines"] == 4 and r2["n_punct_lines"] == 0
    assert r2["n_short_lines"] == 4
    assert r2["n_dup_lines"] == 1  # second 'Home' occurrence
    assert r2["dup_line_chars"] == 4
    assert not r2["flag_punct_ratio"]  # 0% < 12%
    assert not r2["flag_short_lines"]  # 100% > 67%
    assert not r2["flag_pass"]

    r3 = out[3]
    assert r3["n_lines"] == 1 and r3["total_line_chars"] == 0
    # empty line: not punct-terminated, short -> punct flag fails
    assert not r3["flag_pass"]


def test_fineweb_dup_line_mass_flag(spark):
    # boilerplate repeated enough to trip the dup-char threshold (20%)
    body = "A real content sentence that is long.\n" + \
           "cookie banner line repeated.\n" * 4
    df = spark.createDataFrame([(1, body.rstrip("\n"))],
                               "doc_id long, text string")
    r = C.fineweb_line_quality(df).collect()[0]
    assert r["n_dup_lines"] == 3
    assert not r["flag_dup_lines"]


def test_vocab_coverage_hand_computed(spark):
    # frequencies: a:4, b:2, c:1, d:1 -> total 8, V=4
    # ranking (cnt desc, token asc): a(4), b(2), c(1), d(1)
    rows = [(1, "a a b c"), (2, "a a b d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["vocab_size"]: r
           for r in C.vocab_coverage(df, ks=(1, 2, 3, 10)).collect()}
    assert out[1]["covered_tokens"] == 4      # just 'a'
    assert out[1]["coverage_milli"] == 500
    assert out[1]["oov_milli"] == 500
    assert out[2]["covered_tokens"] == 6      # a+b
    assert out[2]["coverage_milli"] == 750
    assert out[3]["covered_tokens"] == 7      # a+b+c (tie c<d)
    assert out[10]["covered_tokens"] == 8     # k >= V: full coverage
    assert out[10]["coverage_milli"] == 1000 and out[10]["oov_milli"] == 0
    assert all(r["n_types"] == 4 and r["total_tokens"] == 8
               for r in out.values())


def test_vocab_coverage_monotone_on_corpus(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = C.vocab_coverage(df).collect()
    covs = [r["coverage_milli"] for r in rows]
    assert covs == sorted(covs)  # coverage grows with vocab size
    assert all(r["coverage_milli"] + r["oov_milli"] in (999, 1000)
               for r in rows)  # floored pair sums to ~1000


def test_pack_efficiency_consistent_with_plan(spark):
    rows = [(i, " ".join(["w"] * (5 + i % 7))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    plan = C.pack_sequences(df, seq_len=16, n_shards=4)
    eff = C.pack_efficiency(df, seq_len=16, n_shards=4).collect()
    by_shard = {}
    for r in plan.collect():
        s = by_shard.setdefault(r["shard"], {"docs": 0, "tok": 0, "last": 0})
        s["docs"] += 1
        s["tok"] += r["n_tokens"]
        s["last"] = max(s["last"], r["last_seq"])
    assert len(eff) == len(by_shard)
    for r in eff:
        s = by_shard[r["shard"]]
        n_seqs = s["last"] + 1
        assert r["n_docs"] == s["docs"]
        assert r["total_tokens"] == s["tok"]
        assert r["n_seqs"] == n_seqs
        assert r["pad_tokens"] == n_seqs * 16 - s["tok"]
        assert 0 <= r["pad_tokens"] < 16  # concat packing: tail-only waste
        assert r["efficiency_milli"] == 1000 * s["tok"] // (n_seqs * 16)
