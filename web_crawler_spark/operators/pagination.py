"""Pagination-chain assembly — reconstruct multi-page articles from
``rel=next`` declarations before extraction/dedup.

News sites and forums split one logical document over N fetched pages
("page 2 of 7"); trained-on as fragments they duplicate boilerplate and
truncate context. The pagination links sites publish themselves
(``<link rel="next">``, the signal search engines consumed for years)
chain the fragments back together. The reference crawler fetches page
lists one URL at a time and never joins fragments (its items are
row-shaped, pacong/scrapers/*); at corpus scale the chains live across
the whole fetch table and assembly is relational.

Plan shape: link extraction is a pure-regexp projection
(``functions/urltools.rel_link`` — codegen, no Python); chain rooting
reuses the pointer-doubling resolver from ``operators/redirects`` (5
slim self-joins cover 32-page chains — O(log n) rounds, never a
per-hop join over the corpus); assembly is ONE hash aggregation on the
chain head with an in-agg struct sort (no window over the corpus, the
established ``remove_duplicate_chunks`` reassembly pattern). Cycles
(mis-declared next pointers) are detected by the resolver and excluded
rather than looping; a missing middle page splits the chain at the gap
— each half assembles under its own head (declared, the crawl-side fix
is recrawling the gap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import urltools as U
from .redirects import resolve_redirects


def pagination_edges(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(src, dst) ``rel=next`` mapping: href extracted from the head
    prescan (both attribute orders), resolved against the page URL
    (absolute / protocol- / root- / document-relative), self-loops
    dropped, one out-edge per src (min target — deterministic when a
    page declares several)."""
    # Staged projections, deliberately: inlining
    # resolve_url(url, rel_link(html)) into ONE Project duplicates the
    # rel_link regexp tree (and whatever expression produced html) at
    # every one of resolve_url's ~8 references to its href argument —
    # the generated method blows past Janino's limits (~17k lines) and
    # Spark silently falls back to interpreted eval. Materializing the
    # head prescan and the raw href as named intermediate columns keeps
    # each Project small; CollapseProject leaves them split because the
    # producer expressions are non-cheap and multiply referenced.
    heads = pages.select(
        F.col(url_col).alias("src"),
        F.substring(F.col(html_col).cast("string"), 1, 4096).alias("_head"),
    )
    hrefs = heads.select(
        "src", U.rel_link(F.col("_head"), "next").alias("_href")
    )
    resolved = hrefs.select(
        "src", U.resolve_url(F.col("src"), F.col("_href")).alias("dst")
    )
    # The dst-validity predicate lives INSIDE the aggregate (null-out,
    # then drop empty groups) rather than as a pre-agg .filter(): a
    # Filter would be predicate-pushed below the staged Projects with
    # the full dst expression substituted in TWICE, rebuilding the
    # giant fused method the staging exists to avoid.
    return (
        resolved.groupBy("src")
        .agg(
            F.min(
                F.when(F.col("dst") != F.col("src"), F.col("dst"))
            ).alias("dst")
        )
        .filter(F.col("dst").isNotNull())
    )


def assemble_articles(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    text_col: str = "text",
    max_rounds: int = 5,
    joiner: str = "\n",
) -> DataFrame:
    """Reassemble paginated articles: every page is rooted at its chain
    head by following PREV pointers (the reversed ``rel=next`` edges)
    with pointer doubling, then one aggregation per head concatenates
    the page texts in chain order.

    Returns ``(article_url, n_pages, full_text)`` — one row per chain
    head, including single-page articles (n_pages = 1). Pages the
    resolver flags unresolved (next-pointer cycles, chains past
    2^max_rounds pages) are EXCLUDED from assembly entirely: a cycle has
    no head, and emitting a half-assembled article would silently
    corrupt the corpus.

    Determinism: position in chain = resolver hop count; the in-agg
    sort key is (position, url, text) so even dirty data (two pages
    claiming the same position after a fork) assembles reproducibly.
    """
    nxt = pagination_edges(pages, url_col=url_col, html_col=html_col)
    # prev pointer: the page someone declares next=X is X's predecessor;
    # min() when several pages claim the same successor (forks — dirty
    # data; the losers start their own chains)
    prev = nxt.groupBy("dst").agg(F.min("src").alias("_prev")).select(
        F.col("dst").alias("src"), F.col("_prev").alias("dst")
    )
    rooted = resolve_redirects(prev, max_rounds=max_rounds).select(
        F.col("url").alias("_u"),
        F.col("final_url").alias("_head"),
        F.col("hops").alias("_pos"),
        F.col("resolved").alias("_ok"),
    )
    placed = (
        pages.join(rooted, pages[url_col] == rooted["_u"], "left")
        .select(
            F.coalesce(F.col("_head"), F.col(url_col)).alias("_article"),
            F.coalesce(F.col("_pos"), F.lit(0)).alias("_p"),
            F.coalesce(F.col("_ok"), F.lit(True)).alias("_keep"),
            F.col(url_col).alias("_page_url"),
            F.col(text_col).alias("_text"),
        )
        .filter(F.col("_keep"))
    )
    assembled = (
        placed.groupBy("_article")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("_p").alias("p"),
                                F.col("_page_url").alias("u"),
                                F.col("_text").alias("t"),
                            )
                        )
                    ),
                    lambda x: x["t"],
                ),
                joiner,
            ).alias("full_text"),
        )
    )
    return assembled.select(
        F.col("_article").alias("article_url"), "n_pages", "full_text"
    )
