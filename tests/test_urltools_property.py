"""Property tests for URL canonicalization (the north-rule dedup key):
all surface variants of the same logical URL must collapse to ONE
canonical form, and that form must match a component-built oracle."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from web_crawler_spark.functions import urltools as U

_label = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1, max_size=8).filter(
    lambda s: not s.startswith("-") and not s.endswith("-")
)
_tld = st.sampled_from(["com", "org", "net", "io"])
_component = st.fixed_dictionaries(
    {
        "proto": st.sampled_from(["http", "https"]),
        "host_labels": st.builds(
            lambda ls, t: ls + [t], st.lists(_label, min_size=1, max_size=2), _tld
        ),
        "port": st.sampled_from([None, None, 8080, 9443]),  # None twice: common case
        "path_segs": st.lists(_label, min_size=0, max_size=3),
        "params": st.dictionaries(_label, _label, min_size=0, max_size=4),
    }
)


def _oracle_canonical(c) -> str:
    host = ".".join(c["host_labels"])
    port = f":{c['port']}" if c["port"] else ""
    path = "/" + "/".join(c["path_segs"]) if c["path_segs"] else "/"
    if c["params"]:
        q = "?" + "&".join(sorted(f"{k}={v}" for k, v in c["params"].items()))
    else:
        q = ""
    return f"{c['proto']}://{host}{port}{path}{q}"


def _variants(c) -> list[str]:
    host = ".".join(c["host_labels"])
    path = "/" + "/".join(c["path_segs"]) if c["path_segs"] else ""
    items = [f"{k}={v}" for k, v in c["params"].items()]
    q_fwd = "?" + "&".join(items) if items else ""
    q_rev = "?" + "&".join(reversed(items)) if items else ""
    port = f":{c['port']}" if c["port"] else ""
    default_port = ":80" if c["proto"] == "http" else ":443"
    out = [
        f"{c['proto']}://{host}{port}{path}{q_fwd}",
        f"{c['proto']}://{host.upper()}{port}{path}{q_rev}#frag",
        f"{c['proto'].upper()}://{host}{port}{path}{q_fwd}#other",
    ]
    if not c["port"]:  # explicit default port must collapse too
        out.append(f"{c['proto']}://{host}{default_port}{path}{q_rev}")
    return out


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_component, min_size=15, max_size=15))
def test_canonicalize_collapses_variants(spark, comps):
    rows, want = [], []
    for i, c in enumerate(comps):
        for v in _variants(c):
            rows.append((i, v))
        want.append((i, _oracle_canonical(c)))
    df = spark.createDataFrame(rows, "gid int, url string")
    got = (
        df.select("gid", U.canonicalize_url(F.col("url")).alias("c"))
        .distinct()
        .collect()
    )
    # every variant of group i collapsed to exactly the oracle form
    by_gid = {}
    for r in got:
        by_gid.setdefault(r["gid"], set()).add(r["c"])
    expected = dict((g, {c}) for g, c in want)
    assert by_gid == expected, {
        g: (sorted(by_gid.get(g, ())), sorted(expected[g])) for g in expected
        if by_gid.get(g) != expected[g]
    }


def test_canonicalize_unparseable_host_keeps_distinct(spark):
    """Hosts java.net.URI rejects (all-numeric labels) fall back to the raw
    URL — distinct junk URLs must NOT collide on a NULL canonical (found by
    the property test above before the fallback existed)."""
    df = spark.createDataFrame(
        [("http://0.0/a",), ("http://0.0/b",)], "url string"
    )
    got = sorted(
        r["c"] for r in df.select(U.canonicalize_url(F.col("url")).alias("c")).collect()
    )
    assert got == ["http://0.0/a", "http://0.0/b"]
