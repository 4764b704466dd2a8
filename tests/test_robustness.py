"""Dirty-input robustness: per-record error isolation in the distributed
parse stages (sitemap/xlsx), bounded decompression, sheet-name sanitation,
empty-query/NULL-vector edge guards, and cluster-convergence telemetry.

These pin the F5 error-isolation discipline (reference engine.py:83-90 —
one bad input skips, the run continues) across every ingest surface, plus
the hostile-input bounds a real-crawl corpus requires."""

from __future__ import annotations

import gzip
import io
import re
import zipfile

import pytest

from pyspark.sql import functions as F


# --- sitemap -------------------------------------------------------------


def test_sitemap_malformed_file_isolated(spark, tmp_path):
    from web_crawler_spark.sources.sitemap import sitemap_bytes, sitemap_scan

    (tmp_path / "good.xml").write_bytes(
        sitemap_bytes([("https://s/1", "2025-02-03"), ("https://s/2", None)])
    )
    (tmp_path / "bad.xml").write_bytes(b"<urlset><url><loc>https://x")
    (tmp_path / "bomb.xml.gz").write_bytes(
        gzip.compress(b"<urlset>" + b"x" * 1000 + b"</urlset>")
    )

    rows = sitemap_scan(spark, str(tmp_path)).collect()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["kind"], []).append(r)
    # good.xml yields its 2 urls; bomb.xml.gz is well-formed with no <url>
    # children (0 rows); bad.xml isolates to a single error row
    assert {r["loc"] for r in by_kind["url"]} == {"https://s/1", "https://s/2"}
    assert len(by_kind["error"]) == 1
    assert by_kind["error"][0]["sitemap_path"].endswith("bad.xml")


def test_sitemap_error_row_carries_message(spark, tmp_path):
    from web_crawler_spark.sources.sitemap import sitemap_bytes, sitemap_scan

    (tmp_path / "good.xml").write_bytes(sitemap_bytes([("https://s/1", None)]))
    (tmp_path / "bad.xml").write_bytes(b"<urlset><url><loc>https://x")
    (tmp_path / "trunc.xml.gz").write_bytes(b"\x1f\x8b\x08\x00junknotgzip")

    rows = sitemap_scan(spark, str(tmp_path)).collect()
    errs = [r for r in rows if r["kind"] == "error"]
    assert len(errs) == 2
    assert all(r["loc"] for r in errs)  # exception text present
    assert {r["loc"] for r in rows if r["kind"] == "url"} == {"https://s/1"}


def test_sitemap_gzip_decompression_bounded():
    from web_crawler_spark.sources.sitemap import parse_sitemap

    bomb = gzip.compress(b"<urlset>" + b" " * 100_000 + b"</urlset>")
    with pytest.raises(ValueError, match="decompressed bytes"):
        parse_sitemap(bomb, max_bytes=1_000)
    # under the bound it parses normally
    assert parse_sitemap(bomb, max_bytes=1_000_000) == []


# --- xlsx ----------------------------------------------------------------


def test_xlsx_corrupt_workbook_isolated(spark, tmp_path):
    from web_crawler_spark.sources.xlsx import xlsx_bytes, xlsx_scan

    (tmp_path / "ok.xlsx").write_bytes(
        xlsx_bytes({"S": [["a", 1.0], ["b", 2.0]]})
    )
    (tmp_path / "corrupt.xlsx").write_bytes(b"PK\x03\x04 not a zip really")

    rows = xlsx_scan(spark, str(tmp_path)).collect()
    errs = [r for r in rows if r["sheet"] == "__error__"]
    assert len(errs) == 1
    assert errs[0]["row_idx"] == -1 and errs[0]["cells"][0]
    assert sum(r["sheet"] == "S" for r in rows) == 2


def test_sheet_name_quote_escaped_roundtrip():
    from web_crawler_spark.sources.xlsx import read_xlsx, xlsx_bytes

    name = 'he said "12x9" <&> done'
    wb = read_xlsx(xlsx_bytes({name: [["v"]]}))
    assert list(wb) == [name]
    assert wb[name] == [["v"]]


def test_safe_sheet_name_rules():
    from web_crawler_spark.sources.xlsx import safe_sheet_name

    taken = {"全部商品", "统计摘要"}
    assert safe_sheet_name("a/b:c*d?e[f]g\\h", taken) == "a_b_c_d_e_f_g_h"
    assert safe_sheet_name("x" * 40, taken) == "x" * 31
    assert safe_sheet_name("", taken) == "Sheet"
    # collision with a reserved sheet gets a suffix
    assert safe_sheet_name("全部商品", taken) == "全部商品~2"
    assert safe_sheet_name("全部商品", taken) == "全部商品~3"
    # truncation-induced collision still unique at 31 chars
    long = safe_sheet_name("y" * 40, taken)
    long2 = safe_sheet_name("y" * 40, taken)
    assert long != long2 and len(long2) <= 31


def test_read_xlsx_dense_extent_capped():
    from web_crawler_spark.sources.xlsx import read_xlsx, xlsx_bytes

    data = xlsx_bytes({"S": [[float(c) for c in range(10)] for _ in range(20)]})
    assert len(read_xlsx(data)["S"]) == 20
    with pytest.raises(ValueError, match="max_cells"):
        read_xlsx(data, max_cells=100)


def test_read_xlsx_sparse_ref_bomb_capped():
    """One cell at a huge ref must not densify to gigabytes."""
    from web_crawler_spark.sources.xlsx import read_xlsx, xlsx_bytes

    base = xlsx_bytes({"S": [[1.0]]})
    zin = zipfile.ZipFile(io.BytesIO(base))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zout:
        for item in zin.namelist():
            data = zin.read(item)
            if item == "xl/worksheets/sheet1.xml":
                data = data.replace(
                    b'r="A1"', b'r="XFD1048576"'
                ).replace(b'r="1"', b'r="1048576"')
            zout.writestr(item, data)
    with pytest.raises(ValueError, match="max_cells"):
        read_xlsx(buf.getvalue())


def test_read_xlsx_missing_refs_fall_back_sequential():
    """Rows/cells without r= attributes lay out sequentially."""
    from web_crawler_spark.sources.xlsx import read_xlsx, xlsx_bytes

    base = xlsx_bytes({"S": [["a", "b"], ["c", "d"]]})
    zin = zipfile.ZipFile(io.BytesIO(base))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zout:
        for item in zin.namelist():
            data = zin.read(item)
            if item == "xl/worksheets/sheet1.xml":
                data = re.sub(rb' r="[A-Z]*\d+"', b"", data)
            zout.writestr(item, data)
    assert read_xlsx(buf.getvalue())["S"] == [["a", "b"], ["c", "d"]]


# --- bm25 / similarity edge guards --------------------------------------


def test_bm25_empty_query_returns_empty(spark):
    from web_crawler_spark.operators.corpus import bm25_topk

    docs = spark.createDataFrame(
        [("d1", "alpha beta"), ("d2", "gamma")], ["doc_id", "text"]
    )
    out = bm25_topk(docs, [])
    assert out.columns == ["doc_id", "score"]
    assert out.count() == 0


def test_arrow_bucket_stage_null_and_ragged(spark):
    from web_crawler_spark.operators.similarity import _arrow_bucket_stage

    df = spark.createDataFrame(
        [
            ("a", [1.0, -2.0, 0.5, 3.0]),
            ("b", None),
            ("c", [1.0, -2.0]),  # ragged dim
            ("d", [1.0, -2.0, 0.5, 3.0]),
        ],
        ["vec_id", "embedding"],
    )
    rows = {
        r["id"]: r["bucket"]
        for r in _arrow_bucket_stage(df, 4, "vec_id", "embedding").collect()
    }
    assert rows["b"] is None
    assert rows["a"] == rows["d"] and rows["a"] is not None
    assert rows["c"] is not None  # bucketed against its own dim


def test_arrow_cosine_stage_null_and_mismatch(spark):
    from web_crawler_spark.operators.similarity import _arrow_cosine_stage

    cand = spark.createDataFrame(
        [
            ("q1", "n1", [1.0, 0.0], [1.0, 0.0]),
            ("q2", "n2", None, [1.0, 0.0]),
            ("q3", "n3", [1.0, 0.0], [1.0, 0.0, 5.0]),  # dim mismatch
        ],
        ["vec_id", "nb_id", "qv", "cv"],
    )
    rows = {r["vec_id"]: r["cosine"] for r in _arrow_cosine_stage(cand).collect()}
    assert rows["q1"] == 1.0
    assert rows["q2"] is None and rows["q3"] is None


# --- dedup_clusters convergence telemetry -------------------------------


def test_dedup_clusters_early_exit_and_stats(spark):
    import web_crawler_spark.operators.dedup as D

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in D.dedup_clusters(pairs, max_iters=25).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    stats = D.LAST_CLUSTER_STATS
    assert stats["converged"] is True
    assert stats["rounds"] < 25  # early exit, not the max_iters ceiling
    assert stats["changed_per_round"][-1] == 0


def test_dedup_clusters_nonconvergence_warns_and_strict_raises(spark):
    import web_crawler_spark.operators.dedup as D

    # path graph 0-1-2-...-7: diameter 7, so 1 round cannot converge
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], ["id_a", "id_b"]
    )
    with pytest.warns(RuntimeWarning, match="did not converge"):
        D.dedup_clusters(chain, max_iters=1).collect()
    assert D.LAST_CLUSTER_STATS["converged"] is False

    with pytest.raises(RuntimeError, match="did not converge"):
        D.dedup_clusters(chain, max_iters=1, strict=True)

    # and with enough rounds the same chain converges to min-label 0
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in D.dedup_clusters(chain, max_iters=25).collect()
    }
    assert set(labels.values()) == {0}
    assert D.LAST_CLUSTER_STATS["converged"] is True


def test_write_commodity_workbook_sanitizes_category_sheets(spark, tmp_path):
    from web_crawler_spark.plans.report import write_commodity_workbook
    from web_crawler_spark.sources.xlsx import read_xlsx

    df = spark.createDataFrame(
        [
            ("gold", 'bad/cat:with"quote', 10.0, 1.0, "s1"),
            ("oil", "全部商品", 5.0, -1.0, "s1"),  # collides with reserved
            ("gas", "c" * 40, 3.0, 0.5, "s1"),  # over 31 chars
        ],
        ["name", "category", "current_price", "change_percent", "source"],
    )
    path = str(tmp_path / "wb.xlsx")
    write_commodity_workbook(df, path)
    wb = read_xlsx(open(path, "rb").read())
    names = set(wb)
    assert "全部商品" in names and "统计摘要" in names
    assert "全部商品~2" in names  # collision suffixed
    assert 'bad_cat_with"quote' in names  # slashes/colons sanitized, quote legal in XML now
    assert "c" * 31 in names
    assert all(len(n) <= 31 for n in names if n not in {"全部商品", "统计摘要"})
