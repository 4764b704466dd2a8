"""YAML settings + env-var overlay, mirroring the reference's config system
(pacong/core/config.py:88-173) so a user can point the engine at their own
``settings.yaml`` and get the same seed expansion / politeness knobs.

Semantics reproduced:

* ``Config(path)`` — yaml.safe_load (missing file → {}), then env-var
  overrides with the reference's exact mapping (config.py:105-133):
  PACONG_LOG_LEVEL → logging.level, PACONG_REPORTS_DIR → output.reports_dir,
  PACONG_CHROME_PATH → browser.chrome_path, PACONG_REQUEST_TIMEOUT →
  scraping.request_timeout (int-coerced).
* ``get``/``set`` — dotted-path nested access (config.py:135-158).
* ``enabled_sources`` — the engine-side union of every scraper's
  ``get_data_sources()``: walk ``generic_scrapers`` + ``simple_scrapers``
  sections in config order, skip ``enabled: false``, expand ``urls``
  (string or list) into one source per URL with the ``name_{i+1}`` suffix
  when a scraper has multiple URLs (generic_scraper.py:40-66,
  simple_generic.py:32-53).

The seed FRONTIER built from those sources feeds the same crawl planner as
the synthetic fixture (sources/seeds.py) — config order is crawl priority,
matching the reference's sequential source loop (base_scraper.py:104-118).
"""

from __future__ import annotations

import os
from typing import Any

import yaml
from pyspark.sql import DataFrame, SparkSession

# reference config.py:105-110 — same env vars, same target paths
_ENV_MAPPINGS: dict[str, list[str]] = {
    "PACONG_LOG_LEVEL": ["logging", "level"],
    "PACONG_REPORTS_DIR": ["output", "reports_dir"],
    "PACONG_CHROME_PATH": ["browser", "chrome_path"],
    "PACONG_REQUEST_TIMEOUT": ["scraping", "request_timeout"],
}
_INT_KEYS = {"request_timeout", "retry_attempts"}
_FLOAT_KEYS = {"retry_delay", "rate_limit_delay"}


class Config:
    def __init__(self, config_file: str | None = None):
        self.config_file = config_file
        self._data: dict = self._load()

    def _load(self) -> dict:
        data: dict = {}
        if self.config_file and os.path.exists(self.config_file):
            with open(self.config_file, encoding="utf-8") as f:
                data = yaml.safe_load(f) or {}
        self._overlay_env(data)
        return data

    @staticmethod
    def _overlay_env(data: dict) -> None:
        for env_var, path in _ENV_MAPPINGS.items():
            value: Any = os.getenv(env_var)
            if not value:
                continue
            current = data
            for key in path[:-1]:
                current = current.setdefault(key, {})
            leaf = path[-1]
            try:
                if leaf in _INT_KEYS:
                    value = int(value)
                elif leaf in _FLOAT_KEYS:
                    value = float(value)
            except ValueError:
                pass
            current[leaf] = value

    def get(self, key: str, default: Any = None) -> Any:
        current: Any = self._data
        for k in key.split("."):
            if isinstance(current, dict) and k in current:
                current = current[k]
            else:
                return default
        return current

    def set(self, key: str, value: Any) -> None:
        keys = key.split(".")
        current = self._data
        for k in keys[:-1]:
            current = current.setdefault(k, {})
        current[keys[-1]] = value

    def save(self, file_path: str | None = None) -> None:
        path = file_path or self.config_file
        if not path:
            raise ValueError("no config file path to save to")
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            yaml.dump(self._data, f, default_flow_style=False, allow_unicode=True)

    # -- scraper sections ---------------------------------------------------

    def scraper_configs(self) -> dict[str, dict]:
        """Name → config for every scraper in both sections, config order
        (generic first, like the reference's factory registration)."""
        out: dict[str, dict] = {}
        for section in ("generic_scrapers", "simple_scrapers"):
            for name, cfg in (self._data.get(section) or {}).items():
                if isinstance(cfg, dict) and name not in out:
                    out[name] = cfg
        return out

    def enabled_sources(self) -> list[dict]:
        """Union of get_data_sources() across enabled scrapers: one entry
        per URL, ``{scraper, name, type, url, priority}``; multi-URL
        scrapers get ``name_{i+1}`` suffixes (generic_scraper.py:55-60)."""
        sources = []
        for scraper_name, cfg in self.scraper_configs().items():
            if not cfg.get("enabled", True):
                continue
            base_name = cfg.get("name", scraper_name)
            urls = cfg.get("urls", [])
            if isinstance(urls, str):
                urls = [urls]
            for i, url in enumerate(urls):
                sources.append(
                    {
                        "scraper": scraper_name,
                        "name": f"{base_name}_{i+1}" if len(urls) > 1 else base_name,
                        "type": cfg.get("type", "commodity"),
                        "url": url,
                        "priority": i + 1,
                    }
                )
        return sources


def seeds_from_settings(spark: SparkSession, config: Config) -> DataFrame:
    """Seed frontier (url, source, priority, host, epoch + canonical url
    columns) from the config's enabled sources — the same schema the
    synthetic fixture (sources/seeds.py) produces, so the crawl planner is
    config-driven end to end."""
    from .functions import urltools as U

    rows = [
        (s["url"], s["scraper"], s["priority"], s["name"], 0)
        for s in config.enabled_sources()
    ]
    df = spark.createDataFrame(
        rows, "url string, source string, priority int, name string, epoch int"
    )
    return U.with_url_columns(df)
