"""HTTP API entry point — the engine's analogue of the reference's FastAPI
server (pacong/server.py:15-38): ``POST /scrape`` with
``{user_id, session_id, scraper_names?}`` runs the full analysis and
returns ``{files, summary}``, with multi-tenant isolation by output
directory (``reports/<user>/<session>`` — server.py:30).

Implemented on the stdlib ``http.server`` (this container has no FastAPI;
the contract, not the framework, is the surface being reproduced). The
reference guards concurrent writes with a per-path ``threading.Lock``
(commodity_service.py:18-26); here a per-output-path lock serializes
writers the same way, while Spark's scheduler interleaves the read-side
jobs of concurrent requests freely — on a real cluster this server is a
thin driver-side frontend and FAIR scheduling pools would take the place
of the lock.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import functions as F

_SAFE_SEGMENT = re.compile(r"^[A-Za-z0-9_-]{1,64}$")

_path_locks: dict[str, threading.Lock] = {}
_path_locks_guard = threading.Lock()


def _lock_for(path: str) -> threading.Lock:
    # commodity_service.py:18-26 — one lock per output path
    with _path_locks_guard:
        return _path_locks.setdefault(path, threading.Lock())


class RequestValidationError(ValueError):
    """Client-input failure → HTTP 400. A bare ValueError escaping the
    Spark pipeline itself is an internal failure and maps to 500."""


class ScrapeService:
    """Holds the SparkSession + offline corpus; executes one /scrape call."""

    def __init__(self, spark, pages, reports_root: str,
                 clock_iso: str = "2025-07-22 10:00:00"):
        self.spark = spark
        self.pages = pages
        self.reports_root = reports_root
        self.clock_iso = clock_iso

    def scrape(self, user_id: str, session_id: str,
               scraper_names: list[str] | None = None) -> dict:
        from .plans import pipeline as PL
        from .plans import report as R

        if not (_SAFE_SEGMENT.match(user_id or "") and _SAFE_SEGMENT.match(session_id or "")):
            raise RequestValidationError(
                "user_id/session_id must match [A-Za-z0-9_-]{1,64}"
            )
        out_dir = f"{self.reports_root}/{user_id}/{session_id}"
        clock = F.lit(self.clock_iso).cast("timestamp")
        results = PL.run_full_analysis(self.pages, clock)
        files = {
            "commodities_csv": f"{out_dir}/commodities_csv",
            "by_category": f"{out_dir}/by_category",
            "summary": f"{out_dir}/summary",
        }
        with _lock_for(out_dir):
            R.write_commodity_csv(results["commodities"], files["commodities_csv"])
            R.write_category_report(results["commodities"], files["by_category"])
            R.write_run_result(results["summary"], files["summary"])
        summary = results["summary"].collect()[0].asDict()
        return {"files": files, "summary": summary,
                "scrapers": scraper_names or ["business_insider"]}


def make_server(service: ScrapeService, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet test runs
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._json(200, {"status": "ok"})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/scrape":
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                try:
                    req = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError as ex:
                    raise RequestValidationError(f"invalid JSON body: {ex}") from ex
                result = service.scrape(
                    req.get("user_id", ""), req.get("session_id", ""),
                    req.get("scraper_names"),
                )
                self._json(200, result)
            except RequestValidationError as ex:
                self._json(400, {"error": str(ex)})
            except Exception as ex:  # mirror reference F5: isolate, report
                self._json(500, {"error": str(ex)})

    return ThreadingHTTPServer((host, port), Handler)
