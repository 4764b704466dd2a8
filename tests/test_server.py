"""HTTP API entry point (reference pacong/server.py): POST /scrape with
multi-tenant output isolation."""

import json
import os
import threading
import urllib.request


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_scrape_endpoint(spark, tmp_path):
    from web_crawler_spark.server import ScrapeService, make_server
    from web_crawler_spark.sources.pages import generate_pages

    pages = generate_pages(spark, 120, seed=7).localCheckpoint()
    svc = ScrapeService(spark, pages, str(tmp_path / "reports"))
    httpd = make_server(svc)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
            assert r.status == 200

        status, body = _post(
            f"http://127.0.0.1:{port}/scrape",
            {"user_id": "alice", "session_id": "s1"},
        )
        assert status == 200
        assert body["summary"]["total_count"] > 0
        # multi-tenant isolation by directory (server.py:30)
        assert "/alice/s1/" in body["files"]["commodities_csv"]
        assert os.path.isdir(body["files"]["commodities_csv"])

        status2, body2 = _post(
            f"http://127.0.0.1:{port}/scrape",
            {"user_id": "bob", "session_id": "s9"},
        )
        assert status2 == 200
        assert body2["files"]["commodities_csv"] != body["files"]["commodities_csv"]

        # path-safety rejection
        status3, body3 = _post(
            f"http://127.0.0.1:{port}/scrape",
            {"user_id": "../evil", "session_id": "s1"},
        )
        assert status3 == 400
    finally:
        httpd.shutdown()
