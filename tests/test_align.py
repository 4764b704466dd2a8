"""Gale-Church sentence alignment (operators/align): hand-verified bead
fixtures (the real gate — equal-length 1-1 runs, a planted 2-1 merge, a
planted 0-1 insertion), a kernel-vs-reference differential over the
Spark plumbing, and the truncation guard."""

import math

from web_crawler_spark.operators.align import (
    LP_SCALE,
    _match_cost,
    align_lengths,
    gale_church_align,
)


def test_equal_lengths_align_one_to_one():
    beads = align_lengths([30, 40, 50], [30, 40, 50])
    assert [b[4] for b in beads] == ["1-1", "1-1", "1-1"]
    assert [(b[0], b[2]) for b in beads] == [(0, 0), (1, 1), (2, 2)]


def test_planted_merge_yields_2_1_bead():
    # tgt sentence 1 is the concatenation of src sentences 1+2
    src = [40, 25, 35, 50]
    tgt = [40, 60, 50]
    beads = align_lengths(src, tgt)
    assert [b[4] for b in beads] == ["1-1", "2-1", "1-1"]
    merge = beads[1]
    assert (merge[0], merge[1], merge[2], merge[3]) == (1, 2, 1, 1)


def test_short_insertion_absorbed_by_1_2_merge():
    # Gale-Church priors make 0-1 beads ~90x rarer than 1-2: a short
    # extra tgt sentence is absorbed into its neighbor, not inserted
    src = [40, 40, 40]
    tgt = [40, 7, 40, 40]
    beads = align_lengths(src, tgt)
    assert sorted(b[4] for b in beads) == ["1-1", "1-1", "1-2"]


def test_insertion_beyond_merge_capacity_yields_0_1():
    # one src sentence cannot absorb two extra tgt sentences (no 1-3
    # bead exists) -> a genuine 0-1 insertion must appear
    beads = align_lengths([40], [40, 40, 40])
    assert sorted(b[4] for b in beads) == ["0-1", "1-2"]


def test_deletion_beyond_merge_capacity_yields_1_0():
    beads = align_lengths([40, 40, 40], [40])
    assert sorted(b[4] for b in beads) == ["1-0", "2-1"]


def test_costs_prefer_matched_lengths():
    # a 1-1 bead of equal lengths is cheaper than wildly mismatched ones
    assert _match_cost(40, 40, 1, 1) < _match_cost(40, 120, 1, 1)
    # and the bead cost is finite even for the degenerate empty bead
    assert math.isfinite(_match_cost(0, 0, 1, 1))


def test_spark_kernel_matches_reference(spark):
    rows = [
        (0, "aaaa aaaa. bbbb bbbb bbbb! cccc?", "xxxx xxxx. yyy yyyyy yyy. zzzz"),
        (1, "one sentence only", "une seule phrase"),
        (2, "", "something from nothing"),
    ]
    df = spark.createDataFrame(rows, "pair_id long, src_text string, tgt_text string")
    got = {}
    for r in gale_church_align(df).collect():
        got.setdefault(r["pair_id"], []).append(r)

    def lens(text):
        return [
            len(s.strip())
            for s in __import__("re").split(r"[.!?\n]+", text)
            if s.strip()
        ]

    for pid, src, tgt in rows:
        expect = align_lengths(lens(src), lens(tgt))
        rs = sorted(got.get(pid, []), key=lambda r: r["bead_idx"])
        assert len(rs) == len(expect), pid
        for r, (sf_, sn, tf_, tn, bt, cost) in zip(rs, expect):
            assert (
                r["src_from"], r["src_n"], r["tgt_from"], r["tgt_n"],
                r["bead_type"], r["cost_fp"],
            ) == (sf_, sn, tf_, tn, bt, math.floor(cost * LP_SCALE)), pid
            assert r["truncated"] is False


def test_truncation_guard(spark):
    long_doc = ". ".join("aaaa" for _ in range(40))
    df = spark.createDataFrame(
        [(7, long_doc, long_doc)], "pair_id long, src_text string, tgt_text string"
    )
    out = gale_church_align(df, max_sentences=10).collect()
    assert all(r["truncated"] for r in out)
    # only the 10-sentence prefix was aligned
    assert max(r["src_from"] + r["src_n"] for r in out) == 10


# --- url_language_twins (Buck & Koehn WMT16 URL-matching baseline) ---------

def _twin_pages(spark, rows):
    return spark.createDataFrame(rows, "url string, lang string, text string")


def test_url_twins_path_param_subdomain_forms(spark):
    from web_crawler_spark.operators.align import url_language_twins

    pages = _twin_pages(spark, [
        ("https://w.ex/en/about", "en", "x" * 100),
        ("https://w.ex/fr/about", "fr", "x" * 110),
        ("https://site.ex/doc7?lang=en", "en", "y" * 200),
        ("https://site.ex/doc7?lang=fr", "fr", "y" * 210),
        ("https://en-us.w2.ex/d1", "en-us", "z" * 300),
        ("https://pt-br.w2.ex/d1", "pt-br", "z" * 330),
    ])
    got = {
        (r["url_a"], r["url_b"]): r
        for r in url_language_twins(pages).collect()
    }
    assert set(got) == {
        ("https://w.ex/en/about", "https://w.ex/fr/about"),
        ("https://site.ex/doc7?lang=en", "https://site.ex/doc7?lang=fr"),
        ("https://en-us.w2.ex/d1", "https://pt-br.w2.ex/d1"),
    }
    r = got[("https://w.ex/en/about", "https://w.ex/fr/about")]
    assert (r["lang_a"], r["lang_b"]) == ("en", "fr")
    assert r["len_ratio_milli"] == 1000 * 100 // 110


def test_url_twins_ratio_gate_and_no_marker_exclusion(spark):
    from web_crawler_spark.operators.align import url_language_twins

    pages = _twin_pages(spark, [
        # length ratio 100/500 = 200 milli < 333 -> dropped
        ("https://w.ex/en/b1", "en", "x" * 500),
        ("https://w.ex/de/b1", "de", "x" * 100),
        # no language marker anywhere -> excluded before pairing
        ("https://w.ex/plain/c1", "en", "x" * 100),
        ("https://w.ex/plain/c1?v=2", "fr", "x" * 100),
        # 'it' inside a hyphenated slug is NOT a marker token
        ("https://w.ex/how-it-works", "en", "x" * 100),
        ("https://w.ex/how-it-works?v=2", "it", "x" * 100),
    ])
    assert url_language_twins(pages).count() == 0


def test_url_twins_hot_family_cap(spark):
    from web_crawler_spark.operators.align import (
        URL_LANG_TOKENS, url_language_twins,
    )

    rows = [
        (f"https://hot.ex/{lg}/x", lg, "x" * 100)
        for lg in URL_LANG_TOKENS[:17]
    ]
    assert url_language_twins(_twin_pages(spark, rows)).count() == 0
    # same family under the cap pairs freely: 3 langs -> 3 pairs
    ok = url_language_twins(_twin_pages(spark, rows[:3]))
    assert ok.count() == 3


def test_url_alignment_key_blanks_whole_tokens_only(spark):
    from web_crawler_spark.operators.align import url_alignment_key
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("https://w.ex/en/about",), ("https://w.ex/fr/about",),
         ("https://w.ex/how-it-works",)],
        "url string",
    ).select(url_alignment_key(F.col("url")).alias("k"))
    ks = [r["k"] for r in df.collect()]
    assert ks[0] == ks[1]
    assert "how-it-works" in ks[2]
