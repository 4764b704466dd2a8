"""hreflang variant clustering — group the language/region variants a
site declares for the same logical document.

``<link rel="alternate" hreflang="fr" href="...">`` is the signal sites
publish so search engines serve the right language variant. For a
training corpus it matters twice: variants of one document are NOT
near-duplicates a text-level dedup can catch (different languages, same
content), yet counting all of them inflates a document's effective
weight; and the cluster is exactly what a translation-pair miner wants.
The reference has no multilingual handling (its sources are single-site
price tables); this is a north-rule-scale corpus addition.

Plan shape: tag extraction is one ``regexp_extract_all`` over the head
prescan + array HOFs (filter/transform with per-element regexps — all
codegen, attribute-order-independent because hreflang and href are
pulled from the matched tag separately); cluster formation reuses the
connected-components machinery (``dedup.dedup_clusters``) over the slim
(url, variant_url) edge list — at web scale the edge table is a few
rows per multilingual page, nothing corpus-shaped shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import urltools as U

# rel value must contain the token "alternate" (it may legitimately be a
# multi-token list); hreflang must be present. RE2-portable — no
# lookaheads — so the DuckDB oracle replays the same patterns.
_REL_ALTERNATE = r"""(?is)\brel\s*=\s*["']?[^"'>]*\balternate\b"""
_HREFLANG = r"""(?is)\bhreflang\s*=\s*["']?([A-Za-z0-9-]+)"""
_HREF = r"""(?is)\bhref\s*=\s*["']?([^"'\s>]+)"""


def hreflang_edges(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(url, lang, variant_url): one row per hreflang declaration in the
    head prescan. ``lang`` is lowercased (BCP-47 tags are
    case-insensitive; ``x-default`` rides through as-is); hrefs resolve
    against the page URL; declarations without a usable href or hreflang
    are dropped."""
    head = F.substring(F.col(html_col).cast("string"), 1, 4096)
    tags = F.regexp_extract_all(head, F.lit(r"(?is)<link\b[^>]*>"), 0)
    alt = F.filter(
        tags,
        lambda t: t.rlike(_REL_ALTERNATE) & t.rlike(r"(?is)\bhreflang\s*="),
    )
    exploded = pages.select(
        F.col(url_col).alias("url"), F.explode(alt).alias("_tag")
    )
    lang = F.lower(F.regexp_extract(F.col("_tag"), _HREFLANG, 1))
    href = F.regexp_extract(F.col("_tag"), _HREF, 1)
    return (
        exploded.select(
            "url",
            lang.alias("lang"),
            U.resolve_url(
                F.col("url"), F.when(href != "", href)
            ).alias("variant_url"),
        )
        .filter((F.col("lang") != "") & F.col("variant_url").isNotNull())
    )


def hreflang_clusters(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_iters: int = 25,
) -> DataFrame:
    """One row per page: ``(url, cluster_id, n_langs)`` where cluster_id
    is the minimum URL reachable through the declared variant graph
    (connected components — survives partially-declared clusters where
    only one variant lists the others) and n_langs counts distinct
    hreflang tags seen across the cluster's declarations. Pages
    declaring nothing are singleton clusters of themselves."""
    from .dedup import dedup_clusters

    edges = hreflang_edges(pages, url_col=url_col, html_col=html_col)
    pairs = (
        edges.select(F.col("url").alias("id_a"),
                     F.col("variant_url").alias("id_b"))
        .filter(F.col("id_a") != F.col("id_b"))
        .distinct()
    )
    labs = dedup_clusters(
        pairs,
        docs=pages.select(F.col(url_col).alias("doc_id")),
        id_col="doc_id",
        max_iters=max_iters,
    ).select(F.col("doc_id").alias("url"), "cluster_id")
    # langs per cluster: count distinct declared tags, keyed by the
    # DECLARING page's cluster (clusters include declared-but-uncrawled
    # variant URLs only as labels, never as rows)
    lang_counts = (
        edges.join(labs, "url")
        .groupBy("cluster_id")
        .agg(F.count_distinct("lang").alias("n_langs"))
    )
    return (
        labs.join(lang_counts, "cluster_id", "left")
        .select(
            "url", "cluster_id",
            F.coalesce("n_langs", F.lit(0)).alias("n_langs"),
        )
    )


def hreflang_reciprocity(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Return-link audit over the declared variant graph. Search engines
    only honor an hreflang annotation when the target page annotates
    BACK (the "return tag" requirement) — a one-way declaration is
    dead weight in the page head and a broken cluster for the
    translation-pair miner built on ``hreflang_clusters``. This
    reports every non-reciprocated declaration, split into the two
    actionable cases: the target was crawled and simply doesn't
    declare back (site bug — ``missing_return``) vs the target isn't
    in the corpus at all (crawl gap — ``uncrawled_target``: fix by
    scheduling the URL, not by blaming the site).

    Plan: ``hreflang_edges`` extraction (regexp prescan + array HOFs,
    all codegen) → distinct slim (url, variant) pairs → left-anti
    join against the REVERSED pair set (reciprocity requires a return
    edge with ANY lang, matching the engines' behavior) → left-semi
    style membership join against the crawled URL set to classify.
    Self-declarations (the standard x-default/self row) are dropped.
    Every exchange carries 2–3 string columns; nothing corpus-shaped
    shuffles.

    Returns (url, lang, variant_url, status) for non-reciprocated
    declarations, status ∈ missing_return | uncrawled_target.
    """
    edges = (
        hreflang_edges(pages, url_col=url_col, html_col=html_col)
        .filter(F.col("url") != F.col("variant_url"))
        .select("url", "lang", "variant_url")
        .distinct()
        # materialize the slim edge list once: `back` and the anti-join
        # both consume it, and without the cut the regexp tag-extraction
        # lineage re-runs over the full corpus per consumer (measured 2x
        # on the bench leg)
        .localCheckpoint()
    )
    back = edges.select(
        F.col("variant_url").alias("url"), F.col("url").alias("variant_url")
    ).distinct()
    nonrec = edges.join(back, ["url", "variant_url"], "left_anti")
    crawled = pages.select(
        F.col(url_col).alias("variant_url"), F.lit(1).alias("_crawled")
    ).distinct()
    return nonrec.join(crawled, "variant_url", "left").select(
        "url", "lang", "variant_url",
        F.when(F.col("_crawled").isNotNull(), F.lit("missing_return"))
        .otherwise(F.lit("uncrawled_target"))
        .alias("status"),
    )
