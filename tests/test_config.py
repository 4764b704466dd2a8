"""Config entry point (pacong/core/config.py:88-173 semantics): YAML load,
dotted get/set, PACONG_* env overlay, enabled-source seed expansion, and the
CLI --config / --dump-seeds path."""

import json
import subprocess
import sys

import yaml
from pyspark.sql import functions as F

from web_crawler_spark.config import Config, seeds_from_settings

SETTINGS = {
    "scraping": {"rate_limit_delay": 1.5, "request_timeout": 30},
    "output": {"reports_dir": "reports"},
    "generic_scrapers": {
        "yahoo_like": {
            "enabled": True,
            "name": "Yahoo Like",
            "type": "commodity",
            "urls": "https://finance.example.com/commodities",
            "parser": "html",
            "extraction": {
                "container": "table tbody tr",
                "fields": {"name": {"selector": "td:first-child a"}},
            },
        },
        "disabled_one": {"enabled": False, "urls": "https://off.example.com/x"},
    },
    "simple_scrapers": {
        "multi_api": {
            "enabled": True,
            "name": "Multi API",
            "urls": [
                "https://api.example.com/a",
                "https://api.example.com/b",
                "https://api.example.com/c",
            ],
        },
    },
}


def _write_settings(tmp_path):
    p = tmp_path / "settings.yaml"
    p.write_text(yaml.safe_dump(SETTINGS, allow_unicode=True))
    return str(p)


def test_yaml_load_get_set(tmp_path):
    cfg = Config(_write_settings(tmp_path))
    assert cfg.get("scraping.rate_limit_delay") == 1.5
    assert cfg.get("generic_scrapers.yahoo_like.extraction.container") == "table tbody tr"
    assert cfg.get("missing.path", "dflt") == "dflt"
    cfg.set("a.b.c", 7)
    assert cfg.get("a.b.c") == 7
    # missing file → empty config, not an error (config.py:93-95)
    assert Config(str(tmp_path / "nope.yaml")).get("x", 1) == 1


def test_env_overlay(tmp_path, monkeypatch):
    monkeypatch.setenv("PACONG_REQUEST_TIMEOUT", "99")
    monkeypatch.setenv("PACONG_REPORTS_DIR", "/tmp/other")
    cfg = Config(_write_settings(tmp_path))
    assert cfg.get("scraping.request_timeout") == 99       # int-coerced
    assert cfg.get("output.reports_dir") == "/tmp/other"


def test_enabled_sources_expansion(tmp_path):
    cfg = Config(_write_settings(tmp_path))
    srcs = cfg.enabled_sources()
    # disabled scraper skipped; single-url keeps bare name; multi-url gets
    # _{i+1} suffixes (generic_scraper.py:55-60)
    assert [s["name"] for s in srcs] == [
        "Yahoo Like", "Multi API_1", "Multi API_2", "Multi API_3",
    ]
    assert [s["priority"] for s in srcs] == [1, 1, 2, 3]
    assert srcs[0]["url"] == "https://finance.example.com/commodities"


def test_seeds_from_settings(spark, tmp_path):
    cfg = Config(_write_settings(tmp_path))
    rows = seeds_from_settings(spark, cfg).orderBy("source", "priority").collect()
    assert [(r.source, r.name, r.priority) for r in rows] == [
        ("multi_api", "Multi API_1", 1),
        ("multi_api", "Multi API_2", 2),
        ("multi_api", "Multi API_3", 3),
        ("yahoo_like", "Yahoo Like", 1),
    ]
    # frontier triple attached (canonical_url / url_hash / host)
    assert rows[0].host == "api.example.com"
    assert rows[0].canonical_url.startswith("https://api.example.com/")
    assert rows[0].url_hash is not None


def test_cli_config_dump_seeds(tmp_path):
    path = _write_settings(tmp_path)
    out = subprocess.run(
        [sys.executable, "-m", "web_crawler_spark.cli",
         "--config", path, "--dump-seeds", "--master", "local[2]"],
        capture_output=True, text=True, timeout=300, check=True,
    )
    lines = [json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")]
    assert {l["name"] for l in lines} == {
        "Yahoo Like", "Multi API_1", "Multi API_2", "Multi API_3",
    }
    hosts = {l["host"] for l in lines}
    assert hosts == {"finance.example.com", "api.example.com"}


def test_run_config_sources_css_json_over_corpus(spark):
    """The factory loop: an html (X9 CSS) scraper and a json (S8) scraper,
    both config-compiled, extract from the same offline corpus."""
    from web_crawler_spark.config import Config
    from web_crawler_spark.plans.pipeline import run_config_sources
    from web_crawler_spark.sources.pages import generate_pages

    pages = generate_pages(spark, 60)
    settings = Config(None)
    settings.set("generic_scrapers.css_commodities", {
        "enabled": True,
        "parser": "html",
        "extraction": {
            "container": "table tr",
            "fields": {
                "name": "td:first-child",
                "price": {"selector": "td:nth-child(2)", "transform": "float"},
                "change": "td:nth-child(3)",
            },
        },
        "validation": {"required_fields": ["name", "price"],
                       "formats": {"price": "number"}},
    })
    settings.set("simple_scrapers.coins", {
        "enabled": True,
        "parser": "json",
        "field_mapping": {"name": "name", "current_price": "usd"},
    })
    settings.set("simple_scrapers.off", {"enabled": False, "parser": "json"})

    outs = run_config_sources(pages, settings)
    assert set(outs) == {"css_commodities", "coins"}
    css = outs["css_commodities"].collect()
    # header rows ('Price' fails the number format) are dropped; data rows
    # from both commodity_table and simple_table page classes extract
    assert len(css) > 20
    assert all(r.price.replace(".", "").isdigit() for r in css)
    names = {r.name for r in css}
    assert "Copper" in names or "Milk" in names
    coins = outs["coins"].filter(F.col("current_price").isNotNull()).collect()
    assert len(coins) > 5                      # json_api pages parsed
    assert all(float(r.current_price) > 0 for r in coins)


def test_cli_list_scrapers_from_config(tmp_path):
    path = _write_settings(tmp_path)
    out = subprocess.run(
        [sys.executable, "-m", "web_crawler_spark.cli",
         "--config", path, "--list-scrapers"],
        capture_output=True, text=True, timeout=120, check=True,
    )
    # yaml.safe_dump sorts keys, so assert membership not order
    assert set(out.stdout.split()) == {"yahoo_like", "disabled_one", "multi_api"}
