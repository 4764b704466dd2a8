"""Domain-blocklist gate (operators/urlfilter.py).

Semantics under test (C4/RefinedWeb/UT1 convention):
- an entry blocks the exact host AND every subdomain (label-boundary suffix);
- ``notexample.com`` is NOT blocked by ``example.com`` (no substring match);
- complement mode returns exactly the blocked rows;
- the physical plan contains no shuffle (broadcast joins only).
"""

import pytest
from pyspark.sql import functions as F

from web_crawler_spark.operators import urlfilter as UF


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "https://example.com/a"),            # exact hit
        (2, "https://a.b.example.com/x"),        # deep subdomain hit
        (3, "https://notexample.com/y"),         # substring — must SURVIVE
        (4, "https://good.org/z"),               # clean
        (5, "https://sub.bad.net/q"),            # subdomain of blocked bad.net
        (6, "https://bad.net.evil.io/w"),        # blocked domain as INFIX — survives
        (7, "HTTPS://EXAMPLE.COM:443/upper"),    # case/port-insensitive host
    ]
    return spark.createDataFrame(rows, ["id", "url"])


@pytest.fixture()
def blocklist(spark):
    return spark.createDataFrame(
        [("example.com",), ("BAD.net",), ("bad.net",)], ["domain"]
    )  # duplicate + mixed case: must be lowercased and deduped, no row fan-out


def test_blocklist_semantics(corpus, blocklist):
    kept = UF.domain_blocklist_filter(corpus, blocklist)
    assert sorted(r.id for r in kept.collect()) == [3, 4, 6]
    # complement is exactly the blocked set, and no helper columns leak
    blocked = UF.domain_blocklist_filter(corpus, blocklist, keep="blocked")
    assert sorted(r.id for r in blocked.collect()) == [1, 2, 5, 7]
    assert kept.columns == corpus.columns


def test_blocklist_no_fanout_on_duplicate_entries(corpus, blocklist):
    # duplicated blocklist domains must not duplicate surviving rows
    kept = UF.domain_blocklist_filter(corpus, blocklist)
    assert kept.count() == kept.select("id").distinct().count()


def test_blocklist_plan_probe_side_never_shuffles(corpus, blocklist):
    kept = UF.domain_blocklist_filter(corpus, blocklist, max_labels=6)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    # one broadcast hash join per probed depth (host + depths 2..6), and no
    # sort-merge join / probe-side exchange anywhere: the corpus streams
    assert plan.count("BroadcastHashJoin") == 6
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the deduped blocklist is materialized once (localCheckpoint), so no
    # Exchange survives in the executed plan at all — every join reads the
    # checkpointed build side
    assert "Exchange hashpartitioning" not in plan


def test_pattern_filter_extensions_and_regex(spark):
    rows = [
        (1, "https://a.com/img.JPG"),
        (2, "https://a.com/img.jpg?x=1"),
        (3, "https://a.com/page.html"),
        (4, "https://a.com/wp-login.php"),
        (5, "https://a.com/jpg"),  # no dot — survives extension filter
    ]
    df = spark.createDataFrame(rows, ["id", "url"])
    out = UF.url_pattern_filter(
        df, deny_extensions=[".jpg", "png"], deny_patterns=[r"wp-login"]
    )
    assert sorted(r.id for r in out.collect()) == [3, 5]
