"""Stdlib-only XLSX codec (no openpyxl in this container).

An .xlsx file is a ZIP of SpreadsheetML XML parts (ECMA-376, the public
Office Open XML spec) — ``zipfile`` + ``xml.etree`` cover everything the
reference's Excel entry points need (awswrangler ``s3/_read_excel.py:17``
/ ``_write_excel.py:17`` read/write ONE driver-sized object through
pandas; the heavy lifting there is the engine this module replaces).

Reader: workbook.xml (sheet order/names) -> workbook rels (sheet
targets) -> sharedStrings.xml (rich-text runs concatenated) -> the
sheet's ``<c>`` cells by A1 reference, honoring cell types ``s``
(shared), ``b`` (bool), ``str``/``inlineStr``, and numeric default.
Column types are inferred per column (bool / int / float / string) so
the frame arrives typed.  Limitations stated loudly: date cells are
numbers-with-a-style in XLSX, and styles are deliberately not parsed —
dates read as their serial numbers (the same honest tradeoff as
refusing: no silent wrong values, and the caller can convert).

Writer: inline-string cells (no sharedStrings part needed), minimal
valid part set ([Content_Types].xml, _rels/.rels, workbook + rels,
styles, one sheet).  Excel's own row cap applies upstream.

Both directions are exercised against HAND-WRITTEN SpreadsheetML in the
tests (reader vs the spec, not vs this writer) plus full round-trips.
"""

from __future__ import annotations

import re
import zipfile
from typing import Any
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

from aws_sdk_pandas_spark.exceptions import InvalidArgument

_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"


def _tag(name: str) -> str:
    return f"{{{_NS}}}{name}"


def _col_index(ref: str) -> int:
    """'A1' -> 0, 'AB7' -> 27."""
    acc = 0
    for ch in ref:
        if ch.isdigit():
            break
        acc = acc * 26 + (ord(ch.upper()) - 64)
    return acc - 1


def _col_letter(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def _text_of(el) -> str:
    """Concatenate all <t> runs under an element (rich text)."""
    return "".join(t.text or "" for t in el.iter(_tag("t")))


def read_xlsx(path: str, *, sheet_name: Any = 0, header: bool = True):
    """Parse one sheet into a pandas DataFrame (driver-sized input by
    nature — same contract as the reference's pandas read)."""
    import pandas as pd

    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        sheets = []  # (name, rid)
        for sh in wb.iter(_tag("sheet")):
            sheets.append((sh.get("name"), sh.get(f"{{{_NS_R}}}id")))
        if not sheets:
            raise InvalidArgument(f"no sheets in {path!r}")
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rid_target = {
            r.get("Id"): r.get("Target")
            for r in rels.iter(
                "{http://schemas.openxmlformats.org/package/2006/relationships}Relationship"
            )
        }
        if isinstance(sheet_name, int):
            if sheet_name >= len(sheets):
                raise InvalidArgument(
                    f"sheet index {sheet_name} out of range ({len(sheets)} sheets)"
                )
            pos = sheet_name
        else:
            names = [s[0] for s in sheets]
            if sheet_name not in names:
                raise InvalidArgument(
                    f"sheet {sheet_name!r} not found; have {names}"
                )
            pos = names.index(sheet_name)
        _name, rid = sheets[pos]
        target = rid_target.get(rid) or f"worksheets/sheet{pos + 1}.xml"
        target = target.lstrip("/")
        if not target.startswith("xl/"):
            target = "xl/" + target

        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            ss = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = [_text_of(si) for si in ss.iter(_tag("si"))]

        sheet = ET.fromstring(z.read(target))
        grid: dict[int, dict[int, Any]] = {}
        max_col = -1
        for ri, row in enumerate(sheet.iter(_tag("row"))):
            r_idx = int(row.get("r", ri + 1)) - 1
            for ci, c in enumerate(row.iter(_tag("c"))):
                ref = c.get("r")
                col = _col_index(ref) if ref else ci
                t = c.get("t", "n")
                v_el = c.find(_tag("v"))
                if t == "inlineStr":
                    is_el = c.find(_tag("is"))
                    val: Any = _text_of(is_el) if is_el is not None else None
                elif v_el is None or v_el.text is None:
                    val = None
                elif t == "s":
                    val = shared[int(v_el.text)]
                elif t == "b":
                    val = v_el.text.strip() in ("1", "true", "TRUE")
                elif t == "str":
                    val = v_el.text
                elif t == "e":  # error cell: no honest value
                    val = None
                else:  # numeric
                    txt = v_el.text.strip()
                    f = float(txt)
                    val = int(f) if f.is_integer() and "e" not in txt.lower() else f
                grid.setdefault(r_idx, {})[col] = val
                max_col = max(max_col, col)
        if not grid:
            return pd.DataFrame()
        n_rows = max(grid) + 1
        rows = [
            [grid.get(r, {}).get(c) for c in range(max_col + 1)]
            for r in range(n_rows)
        ]
        if header:
            hdr = [
                str(h) if h not in (None, "") else f"col{i}"
                for i, h in enumerate(rows[0])
            ]
            body = rows[1:]
        else:
            hdr = [f"c{i}" for i in range(max_col + 1)]
            body = rows
        cols: dict[str, list] = {}
        for i, cname in enumerate(hdr):
            cols[cname] = [r[i] for r in body]
        return pd.DataFrame(_typed_columns(cols))


def _typed_columns(cols: dict[str, list]) -> dict[str, list]:
    """Per-column inference: all-bool / all-int / all-numeric stay typed,
    anything mixed stringifies — deterministic, never a silent coercion
    surprise."""
    out = {}
    for name, vals in cols.items():
        non_null = [v for v in vals if v is not None]
        if non_null and all(isinstance(v, bool) for v in non_null):
            out[name] = vals
        elif non_null and all(
            isinstance(v, int) and not isinstance(v, bool) for v in non_null
        ):
            out[name] = vals
        elif non_null and all(
            isinstance(v, (int, float)) and not isinstance(v, bool)
            for v in non_null
        ):
            out[name] = [float(v) if v is not None else None for v in vals]
        else:
            out[name] = [str(v) if v is not None else None for v in vals]
    return out


def _cell_xml(ref: str, value: Any) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (int, float)):
        if isinstance(value, float) and (value != value or value in (float("inf"), float("-inf"))):
            return f'<c r="{ref}" t="inlineStr"><is><t>{value}</t></is></c>'
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    return (
        f'<c r="{ref}" t="inlineStr"><is>'
        f'<t xml:space="preserve">{escape(str(value))}</t></is></c>'
    )


def write_xlsx(
    pdf,
    path: str,
    *,
    sheet_name: str = "Sheet1",
    header: bool = True,
    index: bool = True,
) -> str:
    """Write a pandas DataFrame as a minimal valid .xlsx (inline-string
    cells, no shared-string table).  ``index=True`` mirrors pandas'
    ``to_excel`` default of a leading index column."""
    if not re.fullmatch(r"[^\[\]*?:/\\]{1,31}", sheet_name):
        raise InvalidArgument(f"invalid Excel sheet name {sheet_name!r}")
    cols = list(pdf.columns)
    data_rows = pdf.values.tolist()
    if index:
        cols = [""] + cols
        data_rows = [[ix] + list(r) for ix, r in zip(pdf.index.tolist(), data_rows)]

    def _norm(v: Any) -> Any:
        # numpy scalars -> python; NaN -> empty cell
        if hasattr(v, "item"):
            v = v.item()
        if isinstance(v, float) and v != v:
            return None
        return v

    lines = ["<sheetData>"]
    out_rows = ([cols] if header else []) + data_rows
    for ri, row in enumerate(out_rows, start=1):
        cells = "".join(
            _cell_xml(f"{_col_letter(ci)}{ri}", _norm(v))
            for ci, v in enumerate(row)
        )
        lines.append(f'<row r="{ri}">{cells}</row>')
    lines.append("</sheetData>")
    sheet_xml = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS}">' + "".join(lines) + "</worksheet>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        '<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
        "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS}" xmlns:r="{_NS_R}">'
        f'<sheets><sheet name="{escape(sheet_name)}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>'
        "</Relationships>"
    )
    styles = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<styleSheet xmlns="{_NS}">'
        '<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>'
        '<fills count="1"><fill><patternFill patternType="none"/></fill></fills>'
        '<borders count="1"><border/></borders>'
        '<cellStyleXfs count="1"><xf/></cellStyleXfs>'
        '<cellXfs count="1"><xf xfId="0"/></cellXfs>'
        "</styleSheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/styles.xml", styles)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)
    return path
