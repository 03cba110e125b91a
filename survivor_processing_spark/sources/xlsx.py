"""Minimal xlsx reader + rectangular region scan (SURVEY.md §2 A5).

The reference scans Google-Sheets-exported workbooks with openpyxl,
growing a rectangular region from a start cell under pluggable stop
conditions (reference episode_stats_extract.py:137-190
``extract_subtable``; sheet dispatch :304-347 scans ``A1:AZ100`` for
marker text).  xlsx is ZIP + SpreadsheetML, so the reader here is
stdlib zipfile + ElementTree — shared strings, inline strings, and
numeric cells; enough for data-grid workbooks.  A matching minimal
*writer* exists so tests and fixtures are self-contained.

Semantics re-expressed, not copied: the region scan takes the grid as
a dict and grows right/down until a stop predicate fires, exactly the
capability the reference's ``horizontal_condition`` /
``vertical_condition`` callables provide.
"""

from __future__ import annotations

import io
import re
import zipfile
from collections.abc import Callable
from xml.etree import ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_to_idx(ref: str) -> int:
    """'A' -> 1, 'AZ' -> 52 (column letters of an A1-style ref)."""
    n = 0
    for ch in ref:
        if ch.isdigit():
            break
        n = n * 26 + (ord(ch) - 64)
    return n


def _split_ref(ref: str) -> tuple[int, int]:
    m = re.match(r"([A-Z]+)(\d+)", ref)
    return int(m.group(2)), _col_to_idx(m.group(1))


def read_xlsx_grid(content: bytes) -> dict[str, dict[tuple[int, int], object]]:
    """Parse workbook bytes → {sheet_name: {(row, col): value}} with
    1-based coordinates.  Values: str for text cells, float for
    numeric."""
    zf = zipfile.ZipFile(io.BytesIO(content))

    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in root.findall(f"{_NS}si"):
            shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))

    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rel_ns = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        r.get("Id"): r.get("Target")
        for r in rels.iter(
            "{http://schemas.openxmlformats.org/package/2006/relationships}Relationship"
        )
    }

    sheets: dict[str, dict[tuple[int, int], object]] = {}
    for sh in wb.iter(f"{_NS}sheet"):
        name = sh.get("name")
        target = rid_to_target[sh.get(f"{rel_ns}id")].lstrip("/")
        if not target.startswith("xl/"):
            target = "xl/" + target
        grid: dict[tuple[int, int], object] = {}
        ws = ET.fromstring(zf.read(target))
        for c in ws.iter(f"{_NS}c"):
            ref = c.get("r")
            if ref is None:
                continue
            row, col = _split_ref(ref)
            ctype = c.get("t", "n")
            if ctype == "inlineStr":
                val: object = "".join(
                    t.text or "" for t in c.iter(f"{_NS}t")
                )
            else:
                v = c.find(f"{_NS}v")
                if v is None or v.text is None:
                    continue
                if ctype == "s":
                    val = shared[int(v.text)]
                elif ctype == "str":
                    val = v.text
                else:
                    val = float(v.text)
            grid[(row, col)] = val
        sheets[name] = grid
    return sheets


def scan_region(
    grid: dict[tuple[int, int], object],
    start_row: int,
    start_col: int,
    stop_col: Callable[[object], bool] | None = None,
    stop_row: Callable[[object], bool] | None = None,
    max_rows: int = 10_000,
    max_cols: int = 256,
) -> list[list[object]]:
    """Grow a rectangle from (start_row, start_col): extend right
    until ``stop_col(header_cell)`` (default: empty), down until
    ``stop_row(first_cell)`` (default: empty).  Returns dense rows
    (None for holes) — header row included."""
    stop_col = stop_col or (lambda v: v is None)
    stop_row = stop_row or (lambda v: v is None)

    width = 0
    while width < max_cols and not stop_col(grid.get((start_row, start_col + width))):
        width += 1
    height = 0
    while height < max_rows and not stop_row(grid.get((start_row + height, start_col))):
        height += 1
    return [
        [grid.get((start_row + r, start_col + c)) for c in range(width)]
        for r in range(height)
    ]


def find_marker(
    grid: dict[tuple[int, int], object],
    marker: str,
    max_row: int = 100,
    max_col: int = 52,
) -> tuple[int, int] | None:
    """Locate a marker cell (the reference scans A1:AZ100 for header
    text like 'Tribal Council voting')."""
    for (r, c), v in grid.items():
        if r <= max_row and c <= max_col and isinstance(v, str) and marker in v:
            return (r, c)
    return None


def write_minimal_xlsx(sheets: dict[str, list[list[object]]]) -> bytes:
    """Build a valid single-part xlsx from {sheet: rows} (inline
    strings + numbers).  Fixture/test writer for the reader above."""

    def cell_xml(r: int, c: int, v: object) -> str:
        if v is None:
            return ""
        col = ""
        n = c
        while n:
            n, rem = divmod(n - 1, 26)
            col = chr(65 + rem) + col
        ref = f"{col}{r}"
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return f'<c r="{ref}"><v>{v}</v></c>'
        from xml.sax.saxutils import escape

        return f'<c r="{ref}" t="inlineStr"><is><t>{escape(str(v))}</t></is></c>'

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        names = list(sheets)
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            + "".join(
                f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
                'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
                for i in range(len(names))
            )
            + "</Types>",
        )
        zf.writestr(
            "_rels/.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>",
        )
        zf.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>'
            + "".join(
                f'<sheet name="{n}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
                for i, n in enumerate(names)
            )
            + "</sheets></workbook>",
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            + "".join(
                f'<Relationship Id="rId{i + 1}" '
                'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
                f'Target="worksheets/sheet{i + 1}.xml"/>'
                for i in range(len(names))
            )
            + "</Relationships>",
        )
        for i, n in enumerate(names):
            rows_xml = "".join(
                f'<row r="{r + 1}">'
                + "".join(cell_xml(r + 1, c + 1, v) for c, v in enumerate(row))
                + "</row>"
                for r, row in enumerate(sheets[n])
            )
            zf.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                f"<sheetData>{rows_xml}</sheetData></worksheet>",
            )
    return buf.getvalue()
