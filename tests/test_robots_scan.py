"""robots_scan (sources/robots.py): real-bytes roundtrip, host from
filename, garbage-body isolation."""

from web_crawler_spark.sources.robots import ROBOTS_BODIES, robots_scan


def test_roundtrip_and_garbage_isolation(spark, tmp_path):
    for host, body in ROBOTS_BODIES.items():
        (tmp_path / f"{host}.txt").write_text(body)
    # a binary-garbage robots body yields zero rules, not a failure
    (tmp_path / "broken.example.com.txt").write_bytes(b"\xff\xfe\x00garbage")
    rules = robots_scan(spark, str(tmp_path)).collect()
    hosts = {r["host"] for r in rules}
    assert "markets.businessinsider.com" in hosts
    assert "broken.example.com" not in hosts          # no parseable rules
    assert "api.coingecko.com" not in hosts           # allow-all: no rows
    by = {(r["host"], r["agent"], r["rule"], r["path_prefix"]): r
          for r in rules}
    assert by[("finance.sina.com.cn", "sparkcrawl", "crawl-delay", "")][
        "crawl_delay"] == 0.5
    assert ("finance.sina.com.cn", "*", "disallow", "/") in by
    assert len(rules) == 7
