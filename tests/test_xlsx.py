"""Minimal-XLSX module: roundtrip, foreign-layout parse (sharedStrings +
sparse r="" refs — the layout pandas/openpyxl-family writers emit), and
the distributed binaryFile scan."""

from __future__ import annotations

import io
import zipfile

from web_crawler_spark.sources.xlsx import read_xlsx, write_xlsx, xlsx_bytes, xlsx_scan


def test_roundtrip_types_and_unicode(tmp_path):
    sheets = {
        "Monthly Prices": [
            ["World Bank Commodity Price Data", None, None],
            [None, None, None],
            ["Commodity", "2020", "2021"],
            ["Crude oil, avg", 41.26, 69.07],
            ["Gold", 1770.25, None],
            ["能源 <&> \"quoted\"", 1.5, True],
        ],
        "全部商品": [["rows", 3.0]],
    }
    p = tmp_path / "wb.xlsx"
    write_xlsx(str(p), sheets)
    back = read_xlsx(p.read_bytes())
    assert list(back) == list(sheets)
    assert back == sheets


def _foreign_workbook() -> bytes:
    """Hand-built workbook in the layout standard writers emit: a
    sharedStrings table (t="s" cells), sparse rows (cells skipped entirely,
    explicit r= refs), a rich-run string, and an empty <v/>-less cell."""
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/></Types>',
        )
        zf.writestr(
            "_rels/.rels",
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>",
        )
        zf.writestr(
            "xl/workbook.xml",
            f'<workbook xmlns="{ns}" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            '<sheets><sheet name="Data" sheetId="1" r:id="rId9"/></sheets></workbook>',
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId9" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
            "</Relationships>",
        )
        zf.writestr(
            "xl/sharedStrings.xml",
            f'<sst xmlns="{ns}" count="3" uniqueCount="3">'
            "<si><t>Gold</t></si>"
            "<si><r><t>Crude </t></r><r><t>oil</t></r></si>"
            "<si><t xml:space=\"preserve\"> padded </t></si></sst>",
        )
        zf.writestr(
            "xl/worksheets/sheet1.xml",
            f'<worksheet xmlns="{ns}"><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1"><v>12.5</v></c></row>'
            '<row r="3"><c r="B3" t="s"><v>1</v></c><c r="C3" t="s"><v>2</v></c>'
            '<c r="D3"/></row>'
            "</sheetData></worksheet>",
        )
    return buf.getvalue()


def test_reads_foreign_shared_strings_layout():
    back = read_xlsx(_foreign_workbook())
    assert list(back) == ["Data"]
    rows = back["Data"]
    # row 2 entirely absent -> padded with Nones; D3 has no value -> None
    assert rows == [
        ["Gold", None, 12.5],
        [None, None, None],
        [None, "Crude oil", " padded "],
    ]


def test_xlsx_scan_distributed(spark, tmp_path):
    d = tmp_path / "books"
    d.mkdir()
    for i in range(3):
        write_xlsx(
            str(d / f"wb{i}.xlsx"),
            {"Prices": [["name", "v"], [f"item{i}", float(i * 10)]]},
        )
    out = xlsx_scan(spark, str(d), sheets=["Prices"]).collect()
    assert len(out) == 6  # 3 files x 2 rows
    got = {
        (r["path"].rsplit("/", 1)[-1], r["row_idx"]): r["cells"] for r in out
    }
    assert got[("wb1.xlsx", 1)] == ["item1", "10.0"]
    assert all(r["sheet"] == "Prices" for r in out)


def test_write_commodity_workbook_s11(spark, tmp_path):
    """S11 (excel_writer.py:20-87) on real xlsx bytes: 全部商品 + per-
    category sheets (price desc within category) + 统计摘要."""
    from web_crawler_spark.plans.report import write_commodity_workbook
    from web_crawler_spark.sources.xlsx import read_xlsx

    df = spark.createDataFrame(
        [
            ("Gold", "贵金属", 1900.5, 0.2, "worldbank"),
            ("Silver", "贵金属", 24.1, -0.5, "worldbank"),
            ("Crude oil", "能源", 82.3, 1.1, "sina"),
        ],
        ["name", "category", "current_price", "change_percent", "source"],
    )
    p = tmp_path / "report.xlsx"
    write_commodity_workbook(df, str(p))
    wb = read_xlsx(p.read_bytes())
    assert list(wb) == ["全部商品", "能源", "贵金属", "统计摘要"]
    assert [r[0] for r in wb["全部商品"][1:]] == ["Gold", "Crude oil", "Silver"]
    assert [r[0] for r in wb["贵金属"][1:]] == ["Gold", "Silver"]  # price desc
    assert wb["统计摘要"][1] == ["总数", 3.0]
    assert wb["统计摘要"][3] == ["Top1", "Gold"]


def test_excel_config_stage_via_registry(spark, tmp_path):
    """'excel' parser kind end-to-end through SourceRegistry: workbook
    bytes -> header sniff -> latest-value scan -> registry cleaning."""
    from web_crawler_spark.plans.dsl import SourceRegistry
    from web_crawler_spark.sources.xlsx import write_xlsx

    write_xlsx(
        str(tmp_path / "cmo.xlsx"),
        {
            "Monthly Prices": [
                ["World Bank preamble", None, None],
                ["Commodity", "2023", "2024"],
                ["Crude oil, avg", 41.26, 69.07],
                ["Gold", 1770.25, None],       # latest falls back to 2023
                ["notes: n/a", None, None],    # no numeric -> dropped
            ],
            "Ignored Sheet": [["Commodity", "x"], ["Zinc", 1.0]],
        },
    )
    reg = SourceRegistry()
    reg.register(
        "worldbank",
        {
            "parser": "excel",
            "sheets": ["Monthly Prices"],
            "header_marker": "Commodity",
        },
    )
    pages = spark.read.format("binaryFile").load(str(tmp_path)).select("path", "content")
    out = {r["name"]: r["latest_value"] for r in reg.build("worldbank")(pages).collect()}
    assert out == {"Crude oil, avg": 69.07, "Gold": 1770.25}


def test_sitemap_scan_distributed(spark, tmp_path):
    from web_crawler_spark.sources.sitemap import sitemap_bytes, sitemap_scan

    (tmp_path / "a.xml").write_bytes(
        sitemap_bytes([("https://s/1", "2025-02-03"), ("https://s/2", None)])
    )
    (tmp_path / "b.xml.gz").write_bytes(
        sitemap_bytes([("https://s/3", None)], gz=True)
    )
    (tmp_path / "idx.xml").write_bytes(
        sitemap_bytes([("https://s/a.xml", None)], index=True)
    )
    out = sitemap_scan(spark, str(tmp_path)).collect()
    by_kind = {}
    for r in out:
        by_kind.setdefault(r["kind"], set()).add(r["loc"])
    assert by_kind["url"] == {"https://s/1", "https://s/2", "https://s/3"}
    assert by_kind["sitemap"] == {"https://s/a.xml"}
    lastmods = {r["loc"]: r["lastmod"] for r in out}
    assert lastmods["https://s/1"] == "2025-02-03"
    assert lastmods["https://s/2"] is None
