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


def resolve_url(base: Column, href: Column, max_updirs: int = 6) -> Column:
    """RFC 3986 reference resolution as pure columns (the subset a crawl
    meets in href/rel=canonical attributes):

    - absolute (``scheme://``) → as-is
    - protocol-relative (``//host/…``) → base protocol + href
    - root-relative (``/path``) → base origin + href
    - document-relative (``a/b``, ``./a``, ``../a``) → joined to the base
      path's directory, then ``.``/``..`` segments collapsed by a bounded
      chain of ``regexp_replace`` passes (``max_updirs`` levels — a fixed
      expression, no loop; deeper towers than any real site nests resolve
      partially and are left as-is rather than mis-resolved)
    - empty/NULL href → NULL (caller coalesces to its fallback)

    Fragments are stripped first (resolution targets a document).
    """
    b = base.cast("string")
    h = F.regexp_replace(F.trim(href.cast("string")), r"#.*$", "")
    proto = url_protocol(b)
    authority = F.try_parse_url(b, F.lit("AUTHORITY"))
    origin = F.concat(proto, F.lit("://"), authority)
    base_path = F.coalesce(F.try_parse_url(b, F.lit("PATH")), F.lit("/"))
    base_dir = F.when(
        base_path.rlike("/"), F.regexp_replace(base_path, r"[^/]*$", "")
    ).otherwise(F.lit("/"))

    joined_rel = F.concat(origin, base_dir, h)
    resolved = (
        F.when(h.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), h)
        .when(h.rlike(r"^//"), F.concat(proto, F.lit(":"), h))
        .when(h.rlike(r"^/"), F.concat(origin, h))
        .when((h == "") | h.isNull(), F.lit(None).cast("string"))
        .otherwise(joined_rel)
    )
    # Collapse '/./' then up to max_updirs levels of '/seg/../'; finally
    # clamp any leftover leading '../' at the root (browsers and urljoin
    # both clamp: 'https://h/../x' resolves to 'https://h/x').
    resolved_path_fixed = F.regexp_replace(resolved, r"/(?:\./)+", "/")
    for _ in range(max_updirs):
        # the lookbehind keeps the collapse inside the path: without it
        # '//host/../x' would match the authority as a path segment
        resolved_path_fixed = F.regexp_replace(
            resolved_path_fixed, r"(?<![:/])/[^/.][^/]*/\.\./", "/"
        )
    return F.regexp_replace(
        resolved_path_fixed, r"(://[^/]+)/(?:\.\./)+", "$1/"
    )


def rel_link(html: Column, rel: str) -> Column:
    """href of ``<link rel="<rel>" …>`` from the document head region
    (first 4096 chars — the same prescan discipline as
    :func:`rel_canonical`), both attribute orders; NULL when absent.
    Pure regexp — stays in codegen. ``rel`` must be a plain token
    (next/prev/alternate...); it is interpolated into the pattern."""
    head = F.substring(html.cast("string"), 1, 4096)
    # rel value matched fully-delimited (quoted, or unquoted followed by
    # space/>) so rel="next" never prefix-matches rel="nextdoor"; no
    # lookaheads — the pattern must also run on the RE2 oracle side
    rel_attr = (
        r"""\brel\s*=\s*(?:"{0}"|'{0}'|{0}[\s>])""".format(rel)
    )
    m1 = F.regexp_extract(
        head,
        r"(?is)<link\b[^>]*" + rel_attr
        + r"""[^>]*\bhref\s*=\s*["']?([^"'\s>]+)""",
        1,
    )
    m2 = F.regexp_extract(
        head,
        r"""(?is)<link\b[^>]*\bhref\s*=\s*["']?([^"'\s>]+)["']?[^>]*"""
        + rel_attr,
        1,
    )
    return F.when(m1 != "", m1).when(m2 != "", m2)


def rel_canonical(html: Column) -> Column:
    """href of ``<link rel="canonical" …>`` from the document head region
    (first 4096 chars — the prescan discipline), both attribute orders;
    NULL when absent. Pure regexp — stays in codegen."""
    head = F.substring(html.cast("string"), 1, 4096)
    m1 = F.regexp_extract(
        head,
        r"""(?is)<link\b[^>]*\brel\s*=\s*["']?canonical["']?[^>]*\bhref\s*=\s*["']?([^"'\s>]+)""",
        1,
    )
    m2 = F.regexp_extract(
        head,
        r"""(?is)<link\b[^>]*\bhref\s*=\s*["']?([^"'\s>]+)["']?[^>]*\brel\s*=\s*["']?canonical""",
        1,
    )
    return F.when(m1 != "", m1).when(m2 != "", m2)


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


def idn_host_stage(df, host_col: str = "host", out_col: str = "ascii_host"):
    """IDN → punycode host normalization (RFC 3490, stdlib ``idna``
    codec): internationalized hostnames must map to their ASCII
    (xn--…) form before URL identity is computed, or 'bücher.de' and
    'xn--bcher-kva.de' crawl as two different hosts.

    Punycode is an algorithmic transform no SQL engine expresses, so
    this is an Arrow-batched stage — but it runs on the FILTERED
    non-ASCII subset only: the caller keeps ASCII hosts (the vast
    majority of a real frontier) on the pure-column path and unions
    back. Hosts that fail to encode (bare labels over 63 chars, empty
    labels) pass through lowercased-unchanged rather than failing the
    stage. Lowercasing applies in both paths, matching
    ``canonicalize_url``'s host handling.
    """
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql import types as ST

    non_ascii = df.filter(F.col(host_col).rlike(r"[^\x00-\x7F]"))
    ascii_side = df.filter(~F.col(host_col).rlike(r"[^\x00-\x7F]")).withColumn(
        out_col, F.lower(F.col(host_col))
    )
    schema = ST.StructType(
        list(df.schema) + [ST.StructField(out_col, ST.StringType())]
    )

    def gen(batches):
        for pdf in batches:
            encoded = []
            for h in pdf[host_col]:
                h = (h or "").strip().lower().rstrip(".")
                try:
                    encoded.append(h.encode("idna").decode("ascii"))
                except Exception:
                    encoded.append(h)
            out = pdf.copy()
            out[out_col] = pd.array(encoded, dtype="string")
            yield out

    return non_ascii.mapInPandas(gen, schema).unionByName(ascii_side)
