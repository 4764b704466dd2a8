"""Gale-Church sentence alignment — the classic length-based bitext
aligner (Gale & Church 1993, "A Program for Aligning Sentences in
Bilingual Corpora", Computational Linguistics 19(1)).

Given a (src, tgt) document pair believed to be translations (e.g. the
hreflang variant clusters or the margin-mined bitext pairs this engine
already produces), emit the bead sequence aligning their sentences:
1-1 matches plus the insertion/deletion/merge beads (1-0, 0-1, 2-1,
1-2, 2-2) with the paper's priors. The signal is *character length
only* — translated sentences have strongly correlated lengths — so the
aligner needs no dictionary and runs before any tokenization.

This is the custom-operator tier (c) of the engine: a per-pair dynamic
program that neither Spark builtins nor a SQL oracle can express
(data-dependent DP with erfc-based emission costs), implemented as an
Arrow ``mapInPandas`` kernel. Each input row is one independent pair —
no cross-row state — so the kernel parallelizes embarrassingly and the
shuffle story is whatever partitioning the pair frame already has.

Scale notes: the DP is O(n·m) per pair in sentence counts, with the
standard band cap (``max_sentences``) — a 10^4-sentence document pair
is truncated and flagged rather than allowed to occupy a task for
hours (the politeness of the F5 error-isolation discipline). Costs are
emitted as fixed-point int64 (floor(cost·1e6)) so downstream
aggregation is exact integer arithmetic.

Correctness: no SQL oracle exists for the DP (declared rows-only in
the driver contract); the pytest gate is a differential check against
an independent pure-Python reference implementation plus hand-built
merge/skip fixtures.
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Gale & Church 1993, Table 5 priors and the length-difference model
# parameters (c: expected tgt/src char ratio, s2: per-char variance).
_PRIORS = {
    (1, 1): 0.89,
    (1, 0): 0.0099,
    (0, 1): 0.0099,
    (2, 1): 0.089,
    (1, 2): 0.089,
    (2, 2): 0.011,
}
_C = 1.0
_S2 = 6.8
LP_SCALE = 1_000_000

_SCHEMA = T.StructType(
    [
        T.StructField("pair_id", T.LongType()),
        T.StructField("bead_idx", T.IntegerType()),
        T.StructField("src_from", T.IntegerType()),
        T.StructField("src_n", T.IntegerType()),
        T.StructField("tgt_from", T.IntegerType()),
        T.StructField("tgt_n", T.IntegerType()),
        T.StructField("bead_type", T.StringType()),
        T.StructField("cost_fp", T.LongType()),
        T.StructField("truncated", T.BooleanType()),
    ]
)


def _match_cost(l1: int, l2: int, ns: int, nt: int) -> float:
    """−log P(bead): length-difference z-score through the normal CDF
    (two-sided tail via erfc) plus the bead-type prior. Pure function of
    the four ints — deterministic everywhere Python floats are."""
    prior = _PRIORS[(ns, nt)]
    if l1 == 0 and l2 == 0:
        return -math.log(prior)
    mean = (l1 + l2 / _C) / 2.0
    if mean <= 0:
        return -math.log(prior)
    delta = (l2 - l1 * _C) / math.sqrt(_S2 * mean)
    # two-sided tail probability, floored to keep log finite
    tail = max(math.erfc(abs(delta) / math.sqrt(2.0)), 1e-300)
    return -math.log(tail) - math.log(prior)


def align_lengths(
    src_lens: list[int], tgt_lens: list[int]
) -> list[tuple[int, int, int, int, str, float]]:
    """The Gale-Church DP over sentence character lengths. Returns beads
    ``(src_from, src_n, tgt_from, tgt_n, type, cost)`` in document
    order. Pure Python — shared verbatim by the Spark kernel and the
    test reference so the differential test pins the kernel plumbing,
    not a reimplementation."""
    n, m = len(src_lens), len(tgt_lens)
    inf = float("inf")
    # D[i][j] = min cost aligning first i src and j tgt sentences
    d = [[inf] * (m + 1) for _ in range(n + 1)]
    back = [[None] * (m + 1) for _ in range(n + 1)]
    d[0][0] = 0.0
    for i in range(n + 1):
        for j in range(m + 1):
            base = d[i][j]
            if base == inf:
                continue
            for ns, nt in _PRIORS:
                i2, j2 = i + ns, j + nt
                if i2 > n or j2 > m:
                    continue
                l1 = sum(src_lens[i:i2])
                l2 = sum(tgt_lens[j:j2])
                c = base + _match_cost(l1, l2, ns, nt)
                if c < d[i2][j2] - 1e-12 or (
                    abs(c - d[i2][j2]) <= 1e-12
                    and back[i2][j2] is not None
                    and (ns, nt) < back[i2][j2]
                ):
                    # strict improvement, or deterministic (ns, nt)
                    # tie-break so equal-cost paths pick one canonical
                    # backtrace
                    d[i2][j2] = c
                    back[i2][j2] = (ns, nt)
    beads: list[tuple[int, int, int, int, str, float]] = []
    i, j = n, m
    while (i, j) != (0, 0):
        ns, nt = back[i][j]
        i -= ns
        j -= nt
        l1 = sum(src_lens[i : i + ns])
        l2 = sum(tgt_lens[j : j + nt])
        beads.append(
            (i, ns, j, nt, f"{ns}-{nt}", _match_cost(l1, l2, ns, nt))
        )
    beads.reverse()
    return beads


def split_sentences(col):
    """Deterministic sentence splitter: break on ``.``, ``!``, ``?`` or
    newline runs; drop empty segments; per-sentence char length =
    length of the trimmed segment. JVM-side column algebra — the DP
    kernel only ever sees integer length arrays, never document text."""
    segs = F.split(col.cast("string"), r"[.!?\n]+")
    trimmed = F.transform(segs, lambda s: F.trim(s))
    kept = F.filter(trimmed, lambda s: F.length(s) > 0)
    return F.transform(kept, lambda s: F.length(s))


def gale_church_align(
    pairs: DataFrame,
    src_col: str = "src_text",
    tgt_col: str = "tgt_text",
    id_col: str = "pair_id",
    max_sentences: int = 512,
) -> DataFrame:
    """Align every (src, tgt) document pair; one output row per bead.

    The pair frame is projected to ``(pair_id, src_lens, tgt_lens)``
    BEFORE the kernel — document text never enters Python. Pairs longer
    than ``max_sentences`` on either side are truncated to the prefix
    and flagged ``truncated`` (O(n·m) DP guard; callers re-chunk via
    passage_windows when they need full coverage of pathological
    documents).
    """
    slim = pairs.select(
        F.col(id_col).cast("long").alias("pair_id"),
        split_sentences(F.col(src_col)).alias("src_lens"),
        split_sentences(F.col(tgt_col)).alias("tgt_lens"),
    )

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in _SCHEMA.fields}
            for pid, sl, tl in zip(
                pdf["pair_id"], pdf["src_lens"], pdf["tgt_lens"]
            ):
                sl = [int(x) for x in (sl if sl is not None else [])]
                tl = [int(x) for x in (tl if tl is not None else [])]
                trunc = (
                    len(sl) > max_sentences or len(tl) > max_sentences
                )
                sl, tl = sl[:max_sentences], tl[:max_sentences]
                for k, (sf_, sn, tf_, tn, bt, cost) in enumerate(
                    align_lengths(sl, tl)
                ):
                    out["pair_id"].append(int(pid))
                    out["bead_idx"].append(k)
                    out["src_from"].append(sf_)
                    out["src_n"].append(sn)
                    out["tgt_from"].append(tf_)
                    out["tgt_n"].append(tn)
                    out["bead_type"].append(bt)
                    out["cost_fp"].append(
                        int(math.floor(cost * LP_SCALE))
                    )
                    out["truncated"].append(bool(trunc))
            yield pd.DataFrame(out)

    return slim.mapInPandas(gen, schema=_SCHEMA)


# ---------------------------------------------------------------------------
# URL-pattern cross-language document alignment (Buck & Koehn, WMT16
# "Findings of the WMT 2016 Bilingual Document Alignment Shared Task";
# the baseline every submission built on: two URLs whose strings MATCH
# after language identifiers are stripped are candidate translations —
# example.com/en/about <-> example.com/fr/about). The reference crawler
# has no multilingual pairing at all (pacong/scrapers/* are monolingual
# price scrapers); this is the corpus-engine op that turns a raw crawl
# into parallel-document candidates, upstream of gale_church_align and
# the margin-based bitext miner.
#
# Mechanics: the URL is tokenized on /?&=.: boundaries and every token
# that is a language marker (ISO 639-1 code, common locale form like
# en-us / zh-hant, or an English language name) is blanked to '@L'; the
# re-joined token string is the alignment key. This one rule covers the
# three real-world shapes at once — path segments (/en/), subdomains
# (en.site.tld), and query params (lang=en) — because all three
# separators tokenize. URLs with no blanked token cannot be detected by
# this method and are dropped (their keys would only collide via
# separator aliasing noise). Same-language twins are DUST territory,
# not translation candidates, so pairs require lang_a < lang_b.
#
# Scale shape: the key is computed in the scan projection along with
# char-length — page TEXT never leaves the scan. One count-window on
# key caps runaway families (a blanked-to-death key matching hundreds
# of docs is template noise, not translations), then one slim
# (url, lang, key, ln) self-join on key emits pairs. Both shuffles
# carry ~100-byte rows and hash-partition on key with the family cap
# bounding fanout, so the plan is the same at 10^10 URLs.
# ---------------------------------------------------------------------------

# Markers are matched as WHOLE tokens only — 'it' as a path segment is a
# language marker; 'it' inside 'how-it-works' never tokenizes apart.
URL_LANG_TOKENS: tuple = (
    "en", "fr", "de", "es", "it", "pt", "nl", "ru", "zh", "ja", "ko",
    "ar", "pl", "tr", "sv", "cs", "da", "fi", "el", "he", "hi", "th",
    "vi", "id", "uk", "ro", "hu", "no",
    "en-us", "en-gb", "fr-fr", "fr-ca", "de-de", "de-at", "es-es",
    "es-mx", "pt-br", "pt-pt", "zh-cn", "zh-tw", "zh-hans", "zh-hant",
    "ja-jp", "ko-kr",
    "english", "french", "german", "spanish", "italian", "portuguese",
    "dutch", "russian", "chinese", "japanese", "korean", "arabic",
    "polish", "turkish",
)

_URL_TOKEN_SPLIT = r"[/?&=.:]"


def url_alignment_key(col):
    """Language-agnostic alignment key: URL tokenized on ``/?&=.:``,
    language-marker tokens blanked to ``@L``, re-joined with ``/``.
    Pure column algebra (split + transform + array_join) — portable to
    the SQL oracle verbatim."""
    toks = F.split(F.lower(col), _URL_TOKEN_SPLIT)
    markers = F.array(*[F.lit(t) for t in URL_LANG_TOKENS])
    return F.array_join(
        F.transform(
            toks,
            lambda t: F.when(F.array_contains(markers, t), F.lit("@L"))
            .otherwise(t),
        ),
        "/",
    )


def url_language_twins(
    pages: DataFrame,
    min_len_ratio_milli: int = 333,
    max_family: int = 16,
) -> DataFrame:
    """Candidate translation-document pairs from URL structure alone.

    ``pages`` needs (url, lang, text). Returns one row per cross-language
    candidate pair: (key, url_a, lang_a, url_b, lang_b, len_ratio_milli)
    where ``len_ratio_milli = floor(1000 * min(len_a,len_b) /
    max(len_a,len_b))`` — the Gale-Church-style length-correlation
    sanity gate, integer-exact. Pairs below ``min_len_ratio_milli`` are
    dropped; keys matching more than ``max_family`` documents are
    template noise and dropped whole.
    """
    from pyspark.sql import Window

    toks = F.split(F.lower(F.col("url")), _URL_TOKEN_SPLIT)
    markers = F.array(*[F.lit(t) for t in URL_LANG_TOKENS])
    n_blanked = F.size(
        F.filter(toks, lambda t: F.array_contains(markers, t))
    )
    slim = (
        pages.filter(F.col("lang").isNotNull() & F.col("text").isNotNull())
        .select(
            F.col("url"),
            F.lower(F.col("lang")).alias("lang"),
            url_alignment_key(F.col("url")).alias("key"),
            F.length("text").cast("long").alias("ln"),
            n_blanked.alias("_nb"),
        )
        .filter(F.col("_nb") >= 1)
        .drop("_nb")
    )
    fam = slim.withColumn(
        "_fam", F.count(F.lit(1)).over(Window.partitionBy("key"))
    ).filter(F.col("_fam") <= F.lit(max_family)).drop("_fam")

    a = fam.select(
        F.col("key"),
        F.col("url").alias("url_a"),
        F.col("lang").alias("lang_a"),
        F.col("ln").alias("_la"),
    )
    b = fam.select(
        F.col("key"),
        F.col("url").alias("url_b"),
        F.col("lang").alias("lang_b"),
        F.col("ln").alias("_lb"),
    )
    ratio = F.floor(
        F.lit(1000) * F.least("_la", "_lb") / F.greatest("_la", "_lb")
    ).cast("long")
    return (
        a.join(b, "key")
        .filter(F.col("lang_a") < F.col("lang_b"))
        .withColumn("len_ratio_milli", ratio)
        .filter(F.col("len_ratio_milli") >= F.lit(min_len_ratio_milli))
        .select(
            "key", "url_a", "lang_a", "url_b", "lang_b", "len_ratio_milli"
        )
    )
