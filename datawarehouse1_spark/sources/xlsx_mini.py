"""Minimal pure-stdlib xlsx reader (zipfile + xml.etree).

The reference's entire input format is xlsx parsed by openpyxl
(etl/app.py:103, etl/requirements.txt:3), but openpyxl is not available
in every deployment. An .xlsx file is a zip of XML parts with a stable
published structure (ECMA-376 / ISO 29500 SpreadsheetML), so the subset
the ingest path needs — shared strings, inline strings, numbers,
booleans, date serials (kept as raw floats; serial->timestamp conversion
is the engine's C18 operator) — parses with nothing beyond the standard
library. This is a clean-room reader of the public file format, not a
port of any library.

Deliberately NOT supported (out of scope for data ingest): formulas
(cached values are read), styles/number formats (serials stay numeric —
exactly what the reference's pipeline expects, see q_excel_serial_date),
merged cells, multiple sheets beyond selection by index.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree

import pandas as pd

_CELL_REF = re.compile(r"([A-Z]+)(\d+)$")


def _local(tag: str) -> str:
    """Strip the XML namespace: '{uri}row' -> 'row'."""
    return tag.rsplit("}", 1)[-1]


def _col_index(ref: str) -> int:
    """'A1' -> 0, 'B3' -> 1, 'AA7' -> 26 (base-26 letters prefix)."""
    m = _CELL_REF.match(ref)
    if not m:
        raise ValueError(f"unparseable cell reference {ref!r}")
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _text_of(elem: ElementTree.Element) -> str:
    """Concatenate all <t> descendant text (plain and rich-text runs),
    honoring xml:space='preserve' (ElementTree keeps the raw text; Excel
    uses the attribute to mark leading/trailing spaces as significant)."""
    parts = []
    for node in elem.iter():
        if _local(node.tag) == "t":
            parts.append(node.text or "")
    return "".join(parts)


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        raw = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ElementTree.fromstring(raw)
    return [_text_of(si) for si in root if _local(si.tag) == "si"]


def _sheet_paths(zf: zipfile.ZipFile) -> list[str]:
    """Worksheet part paths in workbook sheet order (workbook.xml sheet
    r:id -> workbook.xml.rels target)."""
    wb = ElementTree.fromstring(zf.read("xl/workbook.xml"))
    rels = ElementTree.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    target_by_id = {}
    for rel in rels:
        target = rel.get("Target", "")
        if "worksheet" in rel.get("Type", ""):
            # targets may be workbook-relative ('worksheets/sheet1.xml'),
            # package-absolute ('/xl/worksheets/sheet1.xml'), or already
            # prefixed — normalize all three to zip-entry paths
            if target.startswith("/"):
                target = target.lstrip("/")
            if not target.startswith("xl/"):
                target = f"xl/{target}"
            target_by_id[rel.get("Id")] = target
    paths = []
    for node in wb.iter():
        if _local(node.tag) == "sheet":
            rid = next(
                (v for k, v in node.attrib.items() if _local(k) == "id"), None
            )
            if rid in target_by_id:
                paths.append(target_by_id[rid])
    return paths


def _cell_value(cell: ElementTree.Element, shared: list[str]):
    ctype = cell.get("t", "n")
    v_text = None
    for child in cell:
        name = _local(child.tag)
        if name == "v":
            v_text = child.text or ""
        elif name == "is":  # inline string
            return _text_of(child)
    if v_text is None:
        return None
    if ctype == "s":
        return shared[int(v_text)]
    if ctype == "str":  # formula cached string
        return v_text
    if ctype == "b":
        return bool(int(v_text))
    if ctype in ("n", ""):  # numeric (incl. date serials — kept raw)
        try:
            return int(v_text)
        except ValueError:
            return float(v_text)
    return v_text  # unknown type: surface the raw text


def parse_xlsx_bytes(
    data: bytes, sheet: int = 0, header: bool = True
) -> pd.DataFrame:
    """Parse xlsx bytes into a pandas DataFrame (first row as header when
    `header`, pandas-style 'Unnamed: N' for blank header cells — the
    produits.xlsx 7th-column quirk, SURVEY.md §5.2)."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    shared = _shared_strings(zf)
    paths = _sheet_paths(zf)
    if not paths:
        raise ValueError("no worksheets found in workbook")
    if not 0 <= sheet < len(paths):
        raise ValueError(
            f"sheet index {sheet} out of range: workbook has {len(paths)} sheet(s)"
        )
    root = ElementTree.fromstring(zf.read(paths[sheet]))

    grid: dict[int, dict[int, object]] = {}
    n_cols = 0
    for node in root.iter():
        if _local(node.tag) != "row":
            continue
        r = int(node.get("r", len(grid) + 1)) - 1
        row_cells = grid.setdefault(r, {})
        for cell in node:
            if _local(cell.tag) != "c":
                continue
            ref = cell.get("r")
            c = _col_index(ref) if ref else len(row_cells)
            val = _cell_value(cell, shared)
            if val is not None:
                row_cells[c] = val
                n_cols = max(n_cols, c + 1)

    if not grid:
        return pd.DataFrame()
    n_rows = max(grid) + 1
    rows = [[grid.get(r, {}).get(c) for c in range(n_cols)] for r in range(n_rows)]

    if header:
        head, body = rows[0], rows[1:]
        cols = [
            str(h) if h is not None else f"Unnamed: {i}"
            for i, h in enumerate(head)
        ]
        return pd.DataFrame(body, columns=cols)
    return pd.DataFrame(rows)
