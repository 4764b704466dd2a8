"""ARC legacy-container reader (sources/warc.py): header variants, HTTP
split, filedesc block, gzip members, error isolation, roundtrip."""

import gzip
import os

from web_crawler_spark.sources.warc import (
    arc_filedesc_bytes,
    arc_record_bytes,
    arc_scan,
    parse_arc,
    warc_gz_bytes,
)


def test_v1_roundtrip_with_filedesc():
    raw = arc_filedesc_bytes("t.arc") + arc_record_bytes(
        "http://e.com/a", "1.2.3.4", "20080101120000", b"<html>A</html>"
    )
    recs = parse_arc(raw)
    assert [r["arc_type"] for r in recs] == ["filedesc", "response"]
    r = recs[1]
    assert r["url"] == "http://e.com/a" and r["ip"] == "1.2.3.4"
    assert r["http_status"] == 200 and r["payload"] == b"<html>A</html>"
    assert r["arc_date"] == "20080101120000" and r["mime"] == "text/html"


def test_v2_header_and_status_fallback():
    # 10-field v2 header, raw (non-HTTP) payload -> status from field 5
    body = b"plain text payload"
    head = (
        f"http://e.com/b 1.2.3.4 20090101000000 text/plain 404 "
        f"CHK - 0 f.arc {len(body)}\n"
    ).encode()
    recs = parse_arc(head + body + b"\n")
    assert recs[0]["http_status"] == 404
    assert recs[0]["payload"] == body


def test_gzip_member_per_record():
    recs_bytes = [
        arc_record_bytes("http://e.com/1", "1.1.1.1", "20080101000000", b"x"),
        arc_record_bytes("http://e.com/2", "1.1.1.1", "20080101000001", b"y"),
    ]
    recs = parse_arc(warc_gz_bytes(recs_bytes))
    assert [r["url"] for r in recs] == ["http://e.com/1", "http://e.com/2"]


def test_malformed_raises():
    import pytest

    with pytest.raises(ValueError):
        parse_arc(b"only four fields here\nbody")
    with pytest.raises(ValueError):
        parse_arc(b"http://e.com/a 1.1.1.1 20080101000000 text/html 999\nshort")


def test_scan_error_isolation(spark, tmp_path):
    good = arc_record_bytes("http://e.com/ok", "1.1.1.1",
                            "20080101000000", b"fine")
    (tmp_path / "good.arc.gz").write_bytes(warc_gz_bytes([good]))
    (tmp_path / "bad.arc.gz").write_bytes(gzip.compress(b"not an arc header"))
    rows = arc_scan(spark, str(tmp_path)).collect()
    kinds = sorted(r["arc_type"] for r in rows)
    assert kinds == ["error", "response"]
    ok = [r for r in rows if r["arc_type"] == "response"][0]
    assert ok["url"] == "http://e.com/ok" and bytes(ok["payload"]) == b"fine"
