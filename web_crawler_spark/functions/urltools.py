"""URL canonicalization + hashing (BASELINE.json north_rule spec).

The reference crawler never canonicalizes (its URLs are config literals —
pacong/config/settings.yaml:41-60); the spec comes from BASELINE.json:
lowercase host, strip fragment, strip default ports (:80 http / :443 https),
sort query parameters. All native Column expressions — this runs on every
frontier row at 10^10 scale, so it must stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def url_protocol(col: Column) -> Column:
    return F.lower(F.try_parse_url(col, F.lit("PROTOCOL")))


def url_host(col: Column) -> Column:
    """Lowercased host (no port, no userinfo) — the politeness/partition key."""
    return F.lower(F.try_parse_url(col, F.lit("HOST")))


def canonicalize_url(col: Column) -> Column:
    """Canonical form: ``proto://host[:port]path[?k=v&k2=v2]``.

    - protocol + host lowercased
    - default ports dropped (http:80, https:443), explicit others kept
    - empty path → ``/``
    - query params sorted bytewise (param order never distinguishes URLs)
    - fragment dropped
    - unparseable host (e.g. all-numeric labels java.net.URI rejects) →
      fall back to the RAW url string: distinct junk URLs must stay
      distinct in the seen-set rather than collide on a NULL canonical
      (validity gating is X15's job, not canonicalization's)
    """
    url = col.cast("string")
    proto = url_protocol(url)
    host = url_host(url)
    authority = F.try_parse_url(url, F.lit("AUTHORITY"))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    default_port = ((proto == "http") & (port == "80")) | (
        (proto == "https") & (port == "443")
    )
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    raw_path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    query = F.try_parse_url(url, F.lit("QUERY"))
    sorted_query = F.array_join(F.array_sort(F.split(query, "&")), "&")
    query_part = F.when(
        query.isNull() | (query == ""), F.lit("")
    ).otherwise(F.concat(F.lit("?"), sorted_query))
    canonical = F.concat(proto, F.lit("://"), host, port_part, path, query_part)
    return F.coalesce(canonical, url)


def surt_key(col: Column) -> Column:
    """SURT urlkey (Sort-friendly URI Reordering Transform — the Internet
    Archive / Common Crawl CDX index key, e.g. pywb ``canonicalize``):
    ``http://www.Example.com:8080/Path?b=2&a=1#f`` →
    ``com,example:8080)/path?a=1&b=2``.

    - host lowercased, leading ``www`` (optionally digit-suffixed) label
      stripped, dot-separated labels reversed and comma-joined
    - non-default port kept after the reversed host (``:8080``), default
      ports (http:80/https:443) dropped
    - ``)`` separates host from the lowercased path (empty path → ``/``)
    - query params sorted bytewise, fragment dropped, protocol dropped
      (CDX keys are scheme-agnostic so http/https revisits collide)
    - unparseable URL → lowercased raw string (same never-NULL discipline
      as :func:`canonicalize_url`: junk keys must stay distinct, not
      collapse onto NULL)

    Pure Column expressions — the urlkey is computed for every fetched page
    when building a CDX index, so it must stay inside whole-stage codegen.
    """
    url = col.cast("string")
    proto = url_protocol(url)
    host = url_host(url)
    host = F.regexp_replace(host, r"^www\d*\.", "")
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    authority = F.try_parse_url(url, F.lit("AUTHORITY"))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    default_port = ((proto == "http") & (port == "80")) | (
        (proto == "https") & (port == "443")
    )
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    raw_path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    path = F.lower(F.when(raw_path == "", F.lit("/")).otherwise(raw_path))
    query = F.try_parse_url(url, F.lit("QUERY"))
    sorted_query = F.array_join(F.array_sort(F.split(query, "&")), "&")
    query_part = F.when(
        query.isNull() | (query == ""), F.lit("")
    ).otherwise(F.concat(F.lit("?"), sorted_query))
    key = F.concat(rev_host, port_part, F.lit(")"), path, query_part)
    return F.coalesce(key, F.lower(url))


def url_hash(canonical: Column) -> Column:
    """64-bit dedup key over the canonical URL. xxhash64 is JVM-native and
    collision-safe enough for a 10^10 seen-set when paired with the exact
    anti-join on the canonical string as the source of truth."""
    return F.xxhash64(canonical)


def with_url_columns(df, url_col: str = "url"):
    """Attach (canonical_url, url_hash, host) — the standard frontier triple."""
    canon = canonicalize_url(F.col(url_col))
    return (
        df.withColumn("canonical_url", canon)
        .withColumn("url_hash", url_hash(F.col("canonical_url")))
        .withColumn("host", url_host(F.col("canonical_url")))
    )


def host_salt(host: Column, epoch: Column, n_salts: int = 16) -> Column:
    """Per-epoch salt bucket for hot-host skew (north_rule). A host maps to
    exactly ONE salt bucket per epoch (so per-host ordering is preserved
    within an epoch) but the assignment rotates across epochs, spreading a
    persistent hot host across the cluster over time."""
    return F.pmod(F.xxhash64(host, epoch), F.lit(n_salts))
