"""Minimal stdlib-only .xlsx reader/writer (SURVEY A4 fallback engine).

An .xlsx workbook is a zip of XML parts; the subset the vendor importer
needs — sheet discovery by name, header row, shared/inline strings, numeric
cells, usecols projection — is parsed here with ``zipfile`` +
``xml.etree.ElementTree`` so environments without openpyxl still run the
real sheet/usecols semantics of /root/reference/vendor_import.py:221-237.
The writer exists so tests can fabricate real workbook bytes; it emits
inline strings (no sharedStrings part) while the reader handles shared,
inline, formula-string, and numeric cells.

Scale note: vendor workbooks are dimension-sized (a few thousand rows), so
driver-side parsing is correct; the distributed path starts at the Spark
DataFrame the importer produces.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_REL_NS = {"r": "http://schemas.openxmlformats.org/package/2006/relationships"}
_RID = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"


def _col_index(cell_ref: str) -> int:
    """'A1' → 0, 'AB12' → 27 (base-26 column letters)."""
    idx = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _coerce(raw: str):
    """Numeric cell text → int when integral, else float (matching what
    pandas.read_excel surfaces for general-format number cells)."""
    try:
        f = float(raw)
    except ValueError:
        return raw
    return int(f) if f.is_integer() else f


def _sheet_targets(zf: zipfile.ZipFile) -> dict[str, str]:
    """Sheet name → worksheet part path, via workbook.xml + its rels."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    by_rid = {
        rel.get("Id"): rel.get("Target")
        for rel in rels.findall("r:Relationship", _REL_NS)
    }
    out = {}
    for sheet in wb.findall(".//m:sheet", _NS):
        target = by_rid[sheet.get(_RID)]
        if not target.startswith("/"):
            target = "xl/" + target
        out[sheet.get("name")] = target.lstrip("/")
    return out


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.findall("m:si", _NS):
        # plain <t> or rich-text runs <r><t>
        out.append("".join(t.text or "" for t in si.iter(f"{{{_NS['m']}}}t")))
    return out


def _cell_value(c: ET.Element, shared: list[str]):
    ctype = c.get("t", "n")
    if ctype == "inlineStr":
        return "".join(t.text or "" for t in c.iter(f"{{{_NS['m']}}}t"))
    v = c.find("m:v", _NS)
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return shared[int(v.text)]
    if ctype in ("str", "b"):
        return v.text if ctype == "str" else bool(int(v.text))
    return _coerce(v.text)


def read_xlsx(file_path: str, sheet_name: str, usecols: list[str] | None = None):
    """Worksheet → pandas DataFrame: first row is the header, remaining
    rows are data; ``usecols`` projects by header name (KeyError listing
    the missing names if absent — matching pandas' usecols contract)."""
    import pandas as pd

    with zipfile.ZipFile(file_path) as zf:
        targets = _sheet_targets(zf)
        if sheet_name not in targets:
            raise ValueError(
                f"Worksheet named {sheet_name!r} not found "
                f"(has: {sorted(targets)})"
            )
        shared = _shared_strings(zf)
        root = ET.fromstring(zf.read(targets[sheet_name]))
        rows: list[dict[int, object]] = []
        for row in root.findall(".//m:sheetData/m:row", _NS):
            cells = {}
            for c in row.findall("m:c", _NS):
                cells[_col_index(c.get("r", "A"))] = _cell_value(c, shared)
            rows.append(cells)
    if not rows:
        return pd.DataFrame()
    header_cells = rows[0]
    width = max(header_cells) + 1
    header = [header_cells.get(i) for i in range(width)]
    data = [[r.get(i) for i in range(width)] for r in rows[1:]]
    pdf = pd.DataFrame(data, columns=header)
    if usecols is not None:
        missing = [c for c in usecols if c not in pdf.columns]
        if missing:
            raise KeyError(f"usecols not found in sheet: {missing}")
        pdf = pdf[usecols]
    return pdf


_INVALID_SHEET_CHARS = re.compile(r"[\[\]:*?/\\]")


def write_xlsx(file_path: str, sheets: dict[str, list[list[object]]]) -> None:
    """Write a minimal valid workbook: {sheet_name: [[header...], [row...]]}.
    Strings become inline strings; ints/floats numeric cells; None skipped."""

    def cell_xml(ref: str, v) -> str:
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t>{escape(str(v))}</t></is></c>'

    def col_ref(i: int) -> str:
        out = ""
        i += 1
        while i:
            i, rem = divmod(i - 1, 26)
            out = chr(ord("A") + rem) + out
        return out

    names = list(sheets)
    for n in names:
        if _INVALID_SHEET_CHARS.search(n) or len(n) > 31:
            raise ValueError(f"invalid sheet name {n!r}")
    with zipfile.ZipFile(file_path, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
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
            '<?xml version="1.0"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>",
        )
        zf.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>'
            + "".join(
                f'<sheet name="{escape(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
                for i, n in enumerate(names)
            )
            + "</sheets></workbook>",
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            + "".join(
                f'<Relationship Id="rId{i + 1}" '
                'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
                f'Target="worksheets/sheet{i + 1}.xml"/>'
                for i in range(len(names))
            )
            + "</Relationships>",
        )
        for i, n in enumerate(names):
            rows_xml = []
            for ri, row in enumerate(sheets[n]):
                cells = "".join(
                    cell_xml(f"{col_ref(ci)}{ri + 1}", v)
                    for ci, v in enumerate(row)
                )
                rows_xml.append(f'<row r="{ri + 1}">{cells}</row>')
            zf.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<?xml version="1.0"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                f'<sheetData>{"".join(rows_xml)}</sheetData></worksheet>',
            )
