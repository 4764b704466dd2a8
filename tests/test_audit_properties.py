"""Property tests for the late-round audit operators: brute-force
Python references on random inputs must match the distributed plans
exactly — reciprocity on random digraphs, OLS trends vs exact Fraction
arithmetic, split leakage vs set algebra, flapping vs a replayed scan."""

from fractions import Fraction
from math import floor

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from web_crawler_spark.operators import aggregate as AG
from web_crawler_spark.operators import dedup as D
from web_crawler_spark.operators import graph as G
from web_crawler_spark.operators import snapshots as SN

_SET = dict(max_examples=5, deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture])

_node = st.integers(min_value=0, max_value=9)


@settings(**_SET)
@given(st.lists(st.tuples(_node, _node), min_size=0, max_size=40))
def test_link_reciprocity_matches_bruteforce(spark, raw_edges):
    edges = {(f"h{a}", f"h{b}") for a, b in raw_edges if a != b}
    ref = {}
    for s in {a for a, _ in edges}:
        outs = {b for a, b in edges if a == s}
        rec = {b for b in outs if (b, s) in edges}
        ref[s] = (len(outs), len(rec), 1000 * len(rec) // len(outs))
    rows = list(edges) or [("x", "x")]   # degenerate: self-loop only
    df = spark.createDataFrame(rows, ["src_host", "dst_host"])
    got = {
        r.host: (r.out_degree, r.n_reciprocal, r.reciprocity_milli)
        for r in G.link_reciprocity(df).collect()
    }
    assert got == ref


@settings(**_SET)
@given(st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 6), st.integers(-50, 50)),
    min_size=1, max_size=40,
))
def test_trend_by_key_matches_fraction_ols(spark, raw):
    rows = [(f"k{k}", x, y) for k, x, y in raw]
    ref = {}
    for key in {r[0] for r in rows}:
        pts = [(x, y) for k, x, y in rows if k == key]
        n = len(pts)
        sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
        den = n * sxx - sx * sx
        slope = (
            floor(Fraction(1000 * (n * sxy - sx * sy), den))
            if den != 0 else None
        )
        ref[key] = (n, floor(Fraction(1000 * sy, n)), slope)
    df = spark.createDataFrame(rows, "host string, epoch long, quality long")
    got = {
        r.host: (r.n_points, r.mean_y_milli, r.slope_milli)
        for r in AG.trend_by_key(df).collect()
    }
    assert got == ref


@settings(**_SET)
@given(
    st.dictionaries(st.integers(0, 12), st.sampled_from(["tr", "va", "te"]),
                    min_size=1, max_size=13),
    st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12)),
             min_size=0, max_size=30),
)
def test_split_leakage_matches_set_algebra(spark, asg, raw_pairs):
    pairs = {(min(a, b), max(a, b)) for a, b in raw_pairs if a != b}
    ref = {}
    for a, b in pairs:
        sa, sb = asg.get(a), asg.get(b)
        if sa is None or sb is None or sa == sb:
            continue
        (s1, d1), (s2, d2) = sorted([(sa, a), (sb, b)])
        k = (s1, s2)
        e = ref.setdefault(k, [0, set(), set()])
        e[0] += 1; e[1].add(d1); e[2].add(d2)
    ref = {k: (v[0], len(v[1]), len(v[2])) for k, v in ref.items()}
    a_df = spark.createDataFrame(list(asg.items()), "doc_id long, split string")
    p_df = spark.createDataFrame(
        list(pairs) or [(0, 0)], "id_a long, id_b long"
    )
    got = {
        (r.split_a, r.split_b): (r.n_pairs, r.n_docs_a, r.n_docs_b)
        for r in D.split_leakage(a_df, p_df).collect()
    }
    assert got == ref


@settings(**_SET)
@given(st.lists(
    st.tuples(st.integers(0, 2), st.lists(st.integers(0, 2), min_size=1,
                                          max_size=8)),
    min_size=1, max_size=4, unique_by=lambda t: t[0],
))
def test_content_flapping_matches_replay(spark, specs):
    rows, ref = [], {}
    for un, digs in specs:
        url = f"u{un}"
        seq = [f"d{d}" for d in digs]
        rows += [(url, e, s) for e, s in enumerate(seq)]
        trans = sum(1 for i in range(1, len(seq)) if seq[i] != seq[i - 1])
        distinct = len(set(seq))
        if trans > distinct - 1:
            ref[url] = (len(seq), distinct, trans, len(seq) - distinct)
    df = spark.createDataFrame(
        rows, "url string, epoch long, payload_digest string"
    )
    got = {
        r.url: (r.n_fetches, r.n_distinct_payloads, r.n_transitions,
                r.wasted_fetches)
        for r in SN.content_flapping(df).collect()
    }
    assert got == ref


@settings(**_SET)
@given(st.lists(
    st.tuples(
        st.integers(0, 20),
        st.sampled_from(["s0", "s1", "s2"]),
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0,
                 max_size=5),
    ),
    min_size=1, max_size=15, unique_by=lambda t: t[0],
))
def test_effective_tokens_matches_bruteforce(spark, docs):
    import re

    def norm(t):
        return re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", "",
                                          t.lower())).strip()

    rows = [(i, s, " ".join(ws)) for i, s, ws in docs]
    canon = {}
    for i, _, t in sorted(rows):
        canon.setdefault(norm(t), i)
    ref = {}
    for i, s, t in rows:
        n_tok = len(t.split())
        e = ref.setdefault(s, [0, 0, 0, 0])
        e[0] += 1
        e[2] += n_tok
        if canon[norm(t)] == i:
            e[1] += 1
            e[3] += n_tok
    ref = {
        s: (a, b, c, d, 1000 * (c - d) // max(c, 1))
        for s, (a, b, c, d) in ref.items()
    }
    from web_crawler_spark.operators import corpus as CO

    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r.source: (r.n_docs, r.n_canonical_docs, r.raw_tokens,
                   r.effective_tokens, r.dup_token_share_milli)
        for r in CO.effective_tokens(df).collect()
    }
    assert got == ref


@settings(**_SET)
@given(st.lists(
    st.lists(st.sampled_from("abcd"), min_size=0, max_size=8),
    min_size=1, max_size=10,
))
def test_ngram_novelty_matches_bruteforce(spark, token_lists):
    n = 2
    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    first = {}
    per = {}
    for i, toks in enumerate(token_lists):
        grams = {tuple(toks[j:j + n]) for j in range(len(toks) - n + 1)}
        seen = 0
        for g in sorted(grams):
            first.setdefault(g, i)
        for g in grams:
            if first[g] < i:
                seen += 1
        ng = len(grams)
        per[i] = (ng, seen,
                  1000 * (ng - seen) // ng if ng else None)
    from web_crawler_spark.operators import corpus as CO

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_grams, r.n_seen_before, r.novelty_milli)
        for r in CO.ngram_novelty(df, n=n).collect()
    }
    assert got == per
