"""Property tests pinning the xlsx subset contract (sources/xlsx.py):
write_xlsx -> read_xlsx roundtrips arbitrary rectangular cell grids, and
date1904 workbooks surface raw serials (the documented
epoch-flag-is-not-consulted contract)."""

import io
import zipfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from web_crawler_spark.sources.xlsx import read_xlsx, write_xlsx

# cell values the writer supports: None, bool, float (finite), str.
# Text: printable unicode incl. XML-hostile chars; no control chars (the
# contract matches what SpreadsheetML can carry in a text node).
_text = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("L", "N", "P", "S", "Zs"),
    ),
    max_size=20,
)
_cell = st.one_of(
    st.none(),
    st.booleans(),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    _text,
)


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    grid=st.lists(
        st.lists(_cell, min_size=1, max_size=6),
        min_size=1,
        max_size=8,
    ),
    pad=st.integers(min_value=0, max_value=3),
)
def test_roundtrip_property(tmp_path_factory, grid, pad):
    # rectangularize (the writer contract is a rectangular grid); pad rows
    # of trailing Nones to also exercise the ragged-input normalization
    width = max(len(r) for r in grid) + pad
    rect = [r + [None] * (width - len(r)) for r in grid]
    p = tmp_path_factory.mktemp("xlsxprop") / "wb.xlsx"
    write_xlsx(str(p), {"S": rect})
    back = read_xlsx(p.read_bytes())["S"]
    # trailing all-None rows/cols may be trimmed by ref-extent — compare
    # on the written extent, cell by cell, None-padded
    for i, row in enumerate(rect):
        got = back[i] if i < len(back) else []
        for j, cell in enumerate(row):
            g = got[j] if j < len(got) else None
            if isinstance(cell, float):
                assert isinstance(g, float) and (g == cell or abs(g - cell) == 0.0)
            elif isinstance(cell, str) and cell == "":
                assert g in ("", None)  # empty string <-> empty cell
            else:
                assert g == cell, (i, j, cell, g)


def _date1904_workbook() -> bytes:
    """Minimal workbook with workbookPr date1904='1' and one numeric cell
    carrying a date serial — the reader must return the RAW serial float,
    identically to a 1900-epoch workbook (epoch flag not consulted)."""
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
            "<workbookPr date1904=\"1\"/>"
            '<sheets><sheet name="D" sheetId="1" r:id="rId9"/></sheets></workbook>',
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId9" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
            "</Relationships>",
        )
        zf.writestr(
            "xl/worksheets/sheet1.xml",
            f'<worksheet xmlns="{ns}"><sheetData>'
            '<row r="1"><c r="A1"><v>44562.5</v></c></row>'
            "</sheetData></worksheet>",
        )
    return buf.getvalue()


def test_date1904_serials_surface_raw():
    back = read_xlsx(_date1904_workbook())
    assert back == {"D": [[44562.5]]}
