"""web_crawler_spark — a PySpark-native analytics/crawl engine.

A brand-new engine with the query and data-processing capabilities of the
reference crawler (``Zpoteiti/web-crawler``, snapshot at /root/reference),
re-expressed Spark-first:

* DataFrame/SQL logical plans, Catalyst-optimized (no hand scheduling)
* distributed URL-frontier scheduler over epoch-snapshotted tables
* vectorized Arrow/pandas UDFs only where built-ins can't express semantics
* explicit partitioning/skew handling designed for a 10^10-row frontier

Package map (SURVEY.md §7.1):

- ``session``            SparkSession builder (AQE, Arrow, deterministic tz)
- ``functions.scalars``  X1–X16 scalar semantics as native Column expressions
- ``functions.urltools`` URL canonicalization + hashing (north_rule spec)
- ``functions.text``     language-ID, quality scores, tokens, fingerprints
- ``functions.vectors``  embedding math (dot/cosine) as native expressions
- ``operators.*``        dedup, validate, aggregate, topk, similarity, politeness
- ``sources.*``          deterministic fixture generators (pages/seeds/records)
- ``plans.*``            extraction pipelines + the crawl epoch loop
- ``streaming.*``        Structured Streaming variants of the batch operators
- ``multimodal.*``       binary-column plumbing (decode stubs, real schemas)
"""

__version__ = "0.1.0"
