"""train_bpe_distributed (functions/bpe.py): the DataFrame BPE trainer
must reproduce the driver-side reference trainer merge-for-merge —
same pair selection, same tie-breaks, same early stop."""

from web_crawler_spark.functions.bpe import (
    _EOW,
    _pair_counts,
    train_bpe,
    train_bpe_distributed,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog the dog barks",
    "lower lowest newer newest wider widest low new wide",
    "price: 1,299.99 — “smart” quotes… and (parens)!",
    "the the the them then there these those theory",
]


def _df(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], ["text"])


def test_matches_reference_trainer(spark):
    got = train_bpe_distributed(_df(spark, TEXTS), n_merges=30).orderBy(
        "step"
    ).collect()
    want = train_bpe(TEXTS, n_merges=30)
    assert [(r.lhs, r.rhs) for r in got] == want
    assert [r.merged for r in got] == [a + b for a, b in want]
    assert [r.step for r in got] == list(range(1, len(want) + 1))


def test_first_merge_count_is_exact(spark):
    got = train_bpe_distributed(_df(spark, TEXTS), n_merges=1).collect()
    # replicate the reference's round-1 pair counts independently
    import re

    from web_crawler_spark.functions.text import BPE_ISH_PATTERN

    words = {}
    pat = re.compile(BPE_ISH_PATTERN)
    for t in TEXTS:
        for w in pat.findall(t.lower()):
            key = tuple(w) + (_EOW,)
            words[key] = words.get(key, 0) + 1
    counts = _pair_counts(words)
    pair, cnt = max(counts.items(), key=lambda kv: (kv[1], kv[0]))
    assert (got[0].lhs, got[0].rhs, got[0].pair_count) == (*pair, cnt)


def test_early_stop_no_repeating_pair(spark):
    # every word unique and single-occurrence → best pair count 1 → no merges
    out = train_bpe_distributed(_df(spark, ["ab cd ef"]), n_merges=10)
    assert out.count() == 0


def test_merge_semantics_on_runs(spark):
    # 'aaaa' must merge left-to-right non-overlapping: rounds produce
    # (a,a) then pair table over ['aa','aa',EOW] — the reference scan's
    # behavior, certified transitively by merge-table equality
    texts = ["aaaa aaaa aaa"]
    got = train_bpe_distributed(_df(spark, texts), n_merges=5).orderBy(
        "step"
    ).collect()
    want = train_bpe(texts, n_merges=5)
    assert [(r.lhs, r.rhs) for r in got] == want
