"""Minimal XLSX reader/writer on the stdlib (zipfile + ElementTree).

XLSX is a zip of XML parts (ECMA-376 SpreadsheetML). The container has no
xlsx library, but none is needed for the reference's usage surface:

* read — ``pacong/scrapers/worldbank.py:60-119`` downloads a workbook and
  iterates 4 named sheets with header sniffing; cells are strings and
  numbers (no formulas evaluated, no styles consulted).
* write — ``pacong/data/excel_writer.py:20-87`` writes an all-goods sheet,
  per-category sheets, and a summary sheet of strings/numbers.

This module implements exactly that subset: inline/shared strings,
numeric/boolean cells, sheet enumeration in workbook order on read;
inline-string + number cells on write. Round-trips itself and parses the
standard layout produced by common writers (shared-strings table, r=""
cell refs, skipped empty cells).

``xlsx_scan`` distributes the parse: workbooks load as Spark ``binaryFile``
rows and each is parsed inside an Arrow-batched ``mapInPandas`` stage —
(path, sheet, row_idx, cells array<string>) — so a directory of thousands
of workbooks parses in parallel with no driver involvement.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

# escape() alone covers text nodes; attribute values additionally need the
# quote escaped or a '"' in a sheet name yields malformed workbook.xml.
_ATTR_ENTITIES = {'"': "&quot;"}

# Excel sheet-name contract: ≤31 chars, none of []:*?/\ .
_SHEET_FORBIDDEN = re.compile(r"[\[\]:*?/\\]")


def safe_sheet_name(name: str, taken: set[str] | None = None) -> str:
    """Sanitize an arbitrary (e.g. scraped-category) string into a legal,
    unique Excel sheet name: forbidden chars → '_', truncated to 31,
    empty → 'Sheet', collisions suffixed '~2', '~3', …"""
    n = _SHEET_FORBIDDEN.sub("_", str(name)).strip() or "Sheet"
    n = n[:31]
    if taken is not None:
        base, i = n, 1
        while n in taken:
            i += 1
            suffix = f"~{i}"
            n = base[: 31 - len(suffix)] + suffix
        taken.add(n)
    return n

_NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_REL_ATTR = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)
_CELL_REF = re.compile(r"^([A-Z]+)(\d+)$")


def _col_index(ref: str) -> int:
    """'A'→0, 'B'→1, ..., 'AA'→26 (cell ref column letters)."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def read_xlsx(data: bytes, max_cells: int = 10_000_000) -> dict[str, list[list]]:
    """Parse workbook bytes → {sheet_name: rows}, rows as lists padded to
    the sheet's max column; numbers come back as float, strings as str,
    booleans as bool, empty cells as None. Sheets keep workbook order
    (dicts preserve insertion order).

    The output is DENSE (rows padded to max row/col seen), so a hostile
    workbook with one cell at a huge sparse ref (e.g. XFD1048576) would
    materialize rows×cols cells; sheets whose dense extent exceeds
    ``max_cells`` raise ValueError instead — xlsx_rows_stage isolates that
    to an ``__error__`` row. Date handling is out of the subset contract:
    dates surface as their raw serial floats (1900- and 1904-epoch
    workbooks alike — workbookPr date1904 is intentionally not consulted)."""
    zf = zipfile.ZipFile(io.BytesIO(data))

    def xml(name: str):
        return ET.fromstring(zf.read(name))

    # shared strings (optional part)
    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        for si in xml("xl/sharedStrings.xml"):
            shared.append(
                "".join(t.text or "" for t in si.iter(f"{{{_NS_MAIN}}}t"))
            )

    # sheet name -> part path via workbook rels
    rels = {
        rel.get("Id"): rel.get("Target")
        for rel in xml("xl/_rels/workbook.xml.rels")
    }
    out: dict[str, list[list]] = {}
    wb = xml("xl/workbook.xml")
    for sheet in wb.iter(f"{{{_NS_MAIN}}}sheet"):
        name = sheet.get("name")
        target = rels[sheet.get(_NS_REL_ATTR)]
        part = "xl/" + target.lstrip("/").removeprefix("xl/")
        rows: list[tuple[int, dict[int, object]]] = []
        max_col = -1
        ws = xml(part)
        for row_el in ws.iter(f"{{{_NS_MAIN}}}row"):
            r_idx = int(row_el.get("r", len(rows) + 1)) - 1
            cells: dict[int, object] = {}
            next_col = 0
            for c in row_el.iter(f"{{{_NS_MAIN}}}c"):
                ref = c.get("r")
                if ref:
                    m = _CELL_REF.match(ref)
                    col = _col_index(m.group(1)) if m else next_col
                else:
                    col = next_col
                next_col = col + 1
                t = c.get("t", "n")
                v_el = c.find(f"{{{_NS_MAIN}}}v")
                if t == "inlineStr":
                    is_el = c.find(f"{{{_NS_MAIN}}}is")
                    val: object = "".join(
                        e.text or "" for e in is_el.iter(f"{{{_NS_MAIN}}}t")
                    ) if is_el is not None else None
                elif v_el is None or v_el.text is None:
                    val = None
                elif t == "s":
                    val = shared[int(v_el.text)]
                elif t == "b":
                    val = v_el.text == "1"
                elif t == "str":
                    val = v_el.text
                else:
                    val = float(v_el.text)
                if val is not None:
                    cells[col] = val
                    max_col = max(max_col, col)
            rows.append((r_idx, cells))
        max_row = max((r for r, _ in rows), default=-1)
        if (max_row + 1) * (max_col + 1) > max_cells:
            raise ValueError(
                f"sheet {name!r} dense extent {max_row + 1}x{max_col + 1} "
                f"exceeds max_cells={max_cells}"
            )
        dense: list[list] = []
        for r_idx, cells in rows:
            while len(dense) < r_idx:
                dense.append([None] * (max_col + 1))
            dense.append([cells.get(i) for i in range(max_col + 1)])
        out[name] = dense
    return out


def _cell_xml(col: int, row: int, val) -> str:
    letters = ""
    c = col + 1
    while c:
        c, rem = divmod(c - 1, 26)
        letters = chr(65 + rem) + letters
    ref = f"{letters}{row + 1}"
    if val is None:
        return ""
    if isinstance(val, bool):
        return f'<c r="{ref}" t="b"><v>{int(val)}</v></c>'
    if isinstance(val, (int, float)):
        return f'<c r="{ref}"><v>{val!r}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{escape(str(val))}</t></is></c>'


def xlsx_bytes(sheets: dict[str, list[list]]) -> bytes:
    """Serialize {sheet_name: rows} → workbook bytes (inline strings,
    repr()-roundtripped numbers — read_xlsx(xlsx_bytes(s)) == s up to
    int→float)."""
    buf = io.BytesIO()
    names = list(sheets)
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        overrides = "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            for i in range(len(names))
        )
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            f"{overrides}</Types>",
        )
        zf.writestr(
            "_rels/.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>",
        )
        sheet_els = "".join(
            f'<sheet name="{escape(n, _ATTR_ENTITIES)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names)
        )
        zf.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<workbook xmlns="{_NS_MAIN}" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{sheet_els}</sheets></workbook>",
        )
        rel_els = "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            f"{rel_els}</Relationships>",
        )
        for i, name in enumerate(names):
            row_xml = "".join(
                f'<row r="{r + 1}">'
                + "".join(_cell_xml(c, r, v) for c, v in enumerate(row))
                + "</row>"
                for r, row in enumerate(sheets[name])
            )
            zf.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<worksheet xmlns="{_NS_MAIN}">'
                f"<sheetData>{row_xml}</sheetData></worksheet>",
            )
    return buf.getvalue()


def write_xlsx(path: str, sheets: dict[str, list[list]]) -> None:
    with open(path, "wb") as f:
        f.write(xlsx_bytes(sheets))


def xlsx_scan(spark, path: str, sheets: list[str] | None = None):
    """Distributed workbook scan: ``binaryFile`` rows → Arrow-batched parse
    → (path, sheet, row_idx, cells array<string>). One workbook parses
    within one task; a directory of workbooks is the parallel unit
    (matching how a 100 TB archive of crawled workbooks shards:
    file-granular)."""
    return xlsx_rows_stage(
        spark.read.format("binaryFile").load(path).select("path", "content"),
        sheets,
    )


def xlsx_rows_stage(df, sheets: list[str] | None = None):
    """The parse stage alone: a DataFrame with (path string, content
    binary) → (path, sheet, row_idx, cells array<string>). Cells stringify
    (floats via repr — lossless round-trip); empty cells are NULL
    entries.

    Per-workbook error isolation: a corrupt/truncated workbook yields one
    row (sheet='__error__', row_idx=-1, cells=[message]) instead of failing
    the stage — same F5 discipline as the fetch and sitemap paths."""
    import pandas as pd

    from pyspark.sql import types as ST

    want = set(sheets) if sheets is not None else None
    schema = ST.StructType(
        [
            ST.StructField("path", ST.StringType()),
            ST.StructField("sheet", ST.StringType()),
            ST.StructField("row_idx", ST.IntegerType()),
            ST.StructField("cells", ST.ArrayType(ST.StringType())),
        ]
    )

    def gen(batches):
        for pdf in batches:
            out = {"path": [], "sheet": [], "row_idx": [], "cells": []}
            for path_val, content in zip(pdf["path"], pdf["content"]):
                try:
                    workbook = read_xlsx(bytes(content))
                except Exception as exc:  # noqa: BLE001 — isolate bad workbook
                    out["path"].append(path_val)
                    out["sheet"].append("__error__")
                    out["row_idx"].append(-1)
                    out["cells"].append([f"{type(exc).__name__}: {exc}"])
                    continue
                for sheet_name, rows in workbook.items():
                    if want is not None and sheet_name not in want:
                        continue
                    for r_idx, row in enumerate(rows):
                        out["path"].append(path_val)
                        out["sheet"].append(sheet_name)
                        out["row_idx"].append(r_idx)
                        out["cells"].append(
                            [
                                None
                                if v is None
                                else (repr(v) if isinstance(v, float) else str(v))
                                for v in row
                            ]
                        )
            yield pd.DataFrame(out)

    return df.select("path", "content").mapInPandas(gen, schema)


def excel_config_stage(df, config: dict):
    """Config-driven workbook extraction (the reference's worldbank flow,
    worldbank.py:60-161, as a SourceRegistry parser kind): input rows carry
    (path, content binary); per ``config``:

    * ``sheets``: sheet-name allowlist (workbook order preserved);
    * ``header_marker`` (default 'Commodity'): the header row is the first
      row whose FIRST cell equals the marker (worldbank.py:102-112 header
      sniffing); rows above are preamble, rows below are data;
    * output: (path, sheet, name, latest_value) — name from column 0,
      latest_value the right-to-left first parseable number
      (worldbank.py:137-146 'latest non-null').
    """
    from pyspark.sql import functions as F

    rows = xlsx_rows_stage(df, config.get("sheets"))
    marker = config.get("header_marker", "Commodity")
    hdr = (
        rows.filter(F.col("cells")[0] == marker)
        .groupBy("path", "sheet")
        .agg(F.min("row_idx").alias("__h"))
    )
    data = rows.join(hdr, ["path", "sheet"]).filter(F.col("row_idx") > F.col("__h"))
    latest = F.aggregate(
        F.reverse(F.slice(F.col("cells"), 2, 1_000_000)),
        F.lit(None).cast("double"),
        lambda acc, c: F.coalesce(acc, c.try_cast("double")),
    )
    return data.select(
        "path",
        "sheet",
        F.col("cells")[0].alias("name"),
        latest.alias("latest_value"),
    ).filter(F.col("name").isNotNull() & F.col("latest_value").isNotNull())
