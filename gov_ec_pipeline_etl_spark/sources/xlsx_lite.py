"""Minimal XLSX reader/writer on the stdlib (zipfile + ElementTree).

XLSX is ECMA-376 OOXML: a zip holding ``xl/workbook.xml`` (sheet names),
``xl/_rels/workbook.xml.rels`` (sheet targets), optional
``xl/sharedStrings.xml``, and one ``xl/worksheets/sheetN.xml`` per
sheet. This implements exactly the subset the ingest path needs —
string/number cells, shared and inline strings — so Excel resources
parse without openpyxl (which this environment does not bundle). The
full-featured path still prefers pandas+openpyxl when installed.

The writer exists for test fixtures (inline strings only).
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

import pandas as pd

NS = {
    "m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main",
    "r": "http://schemas.openxmlformats.org/officeDocument/2006/relationships",
    "p": "http://schemas.openxmlformats.org/package/2006/relationships",
}


def _col_index(cell_ref: str) -> int:
    """'A1' → 0, 'AB3' → 27."""
    letters = re.match(r"[A-Z]+", cell_ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def sheet_names(path: str) -> list[str]:
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
    return [
        s.attrib["name"] for s in wb.findall("m:sheets/m:sheet", NS)
    ]


def _sheet_targets(z: zipfile.ZipFile) -> dict[str, str]:
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        rel.attrib["Id"]: rel.attrib["Target"]
        for rel in rels.findall("p:Relationship", NS)
    }
    out = {}
    for s in wb.findall("m:sheets/m:sheet", NS):
        rid = s.attrib[f"{{{NS['r']}}}id"]
        target = rid_to_target[rid]
        if not target.startswith("/"):
            target = "xl/" + target.lstrip("./")
        out[s.attrib["name"]] = target.lstrip("/")
    return out


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.findall("m:si", NS):
        out.append("".join(t.text or "" for t in si.iter(f"{{{NS['m']}}}t")))
    return out


def read_sheet(path: str, sheet: str) -> pd.DataFrame:
    """One sheet → DataFrame of strings, first row as header (matching
    pandas.ExcelFile.parse defaults used by the primary path)."""
    with zipfile.ZipFile(path) as z:
        targets = _sheet_targets(z)
        if sheet not in targets:
            raise KeyError(f"no sheet {sheet!r} in {path}")
        strings = _shared_strings(z)
        root = ET.fromstring(z.read(targets[sheet]))
    grid: list[dict[int, str]] = []
    max_col = -1
    for row in root.findall("m:sheetData/m:row", NS):
        cells: dict[int, str] = {}
        for c in row.findall("m:c", NS):
            ref = c.attrib.get("r", "A1")
            col = _col_index(ref)
            t = c.attrib.get("t", "n")
            if t == "s":
                v = c.find("m:v", NS)
                val = strings[int(v.text)] if v is not None else None
            elif t == "inlineStr":
                val = "".join(
                    el.text or "" for el in c.iter(f"{{{NS['m']}}}t")
                )
            else:  # n / str / b
                v = c.find("m:v", NS)
                val = v.text if v is not None else None
            if val is not None:
                cells[col] = val
                max_col = max(max_col, col)
        grid.append(cells)
    if not grid:
        return pd.DataFrame()
    ncols = max_col + 1
    rows = [[r.get(i) for i in range(ncols)] for r in grid]
    header, data = rows[0], rows[1:]
    names = [
        h if h not in (None, "") else f"Unnamed: {i}"
        for i, h in enumerate(header)
    ]
    return pd.DataFrame(data, columns=names, dtype=object)


# --- writer (test fixtures; inline strings only) ------------------------


def _esc(s: str) -> str:
    return (
        str(s)
        .replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
    )


def write_xlsx(path: str, sheets: dict[str, list[list[object]]]) -> None:
    names = list(sheets)
    sheet_xmls = []
    for rows in sheets.values():
        body = []
        for ri, row in enumerate(rows, start=1):
            cells = []
            for ci, val in enumerate(row):
                if val is None:
                    continue
                ref = ""
                col = ci
                while True:
                    ref = chr(65 + col % 26) + ref
                    col = col // 26 - 1
                    if col < 0:
                        break
                cells.append(
                    f'<c r="{ref}{ri}" t="inlineStr"><is><t>{_esc(val)}</t></is></c>'
                )
            body.append(f'<row r="{ri}">{"".join(cells)}</row>')
        sheet_xmls.append(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<worksheet xmlns="{NS["m"]}"><sheetData>{"".join(body)}</sheetData></worksheet>'
        )
    sheet_entries = "".join(
        f'<sheet name="{_esc(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{NS["m"]}" xmlns:r="{NS["r"]}">'
        f"<sheets>{sheet_entries}</sheets></workbook>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{NS["p"]}">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + "</Relationships>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(len(names))
        )
        + "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{NS["p"]}">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        for i, xml in enumerate(sheet_xmls):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", xml)
