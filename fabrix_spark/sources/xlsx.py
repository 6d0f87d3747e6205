"""Streaming .xlsx parser — stdlib only (zipfile + incremental XML).

The reference implements its own SAX reader over the xlsx XML rather
than loading sheets into memory (fabrix-xl/src/ws.rs:244-469); this is
the same design on ``xml.etree.ElementTree.iterparse``:

- workbook/sheet discovery + 1900/1904 date system
  (fabrix-xl/src/lib.rs:32-49, wb.rs);
- shared-string table (rich-text runs concatenated);
- style-based date detection: builtin date numFmtIds plus the
  format-code heuristic (contains d/m/y, "Red" excluded —
  ws.rs:461-469);
- serial→date conversion with the Excel 1900 leap-year bug
  (util.rs:71-105): base 1899-12-31, numbers > 60 shift one day,
  day 0 → time-of-day, zero time → date;
- sparse-cell/row simulation: missing cells yield None, skipped row
  numbers yield empty rows (ws.rs:247-272).

Memory is bounded by one row (plus the shared-string table, which
Excel files amortize heavily); the chunked engine in ``excel.py``
batches these rows into DataFrames.
"""

from __future__ import annotations

import datetime as _dt
import zipfile
from typing import Any, Iterator
from xml.etree import ElementTree as ET

__all__ = ["stream_xlsx_rows", "sheet_names", "write_xlsx"]

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_RID = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"

# builtin numFmtIds that render as dates/times (ECMA-376 §18.8.30)
_DATE_NUMFMT_IDS = set(range(14, 23)) | set(range(27, 37)) | set(range(45, 48)) | set(range(50, 59))


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _col_index(ref: str) -> int:
    """'BC12' -> 0-based column index 54."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def _format_is_date(code: str) -> bool:
    """ws.rs:461-469: 'd' exactly, d-and-not-Red, 'm', or 'y'."""
    if code == "d":
        return True
    if "d" in code and "Red" not in code:
        return True
    return "m" in code or "y" in code


def _load_shared_strings(zf: zipfile.ZipFile) -> list[str]:
    if "xl/sharedStrings.xml" not in zf.namelist():
        return []
    out: list[str] = []
    with zf.open("xl/sharedStrings.xml") as f:
        for _, el in ET.iterparse(f, events=("end",)):
            if _localname(el.tag) == "si":
                out.append("".join(t.text or "" for t in el.iter(f"{_NS}t")))
                el.clear()
    return out


def _load_date_styles(zf: zipfile.ZipFile) -> list[bool]:
    """Per-cellXf flag: does this style index render as a date?"""
    if "xl/styles.xml" not in zf.namelist():
        return []
    root = ET.fromstring(zf.read("xl/styles.xml"))
    custom: dict[int, str] = {}
    for nf in root.iter(f"{_NS}numFmt"):
        custom[int(nf.get("numFmtId", "0"))] = nf.get("formatCode", "")
    flags: list[bool] = []
    cellxfs = root.find(f"{_NS}cellXfs")
    if cellxfs is None:
        return []
    for xf in cellxfs.findall(f"{_NS}xf"):
        fmt_id = int(xf.get("numFmtId", "0"))
        if fmt_id in _DATE_NUMFMT_IDS:
            flags.append(True)
        elif fmt_id in custom:
            flags.append(_format_is_date(custom[fmt_id]))
        else:
            flags.append(False)
    return flags


def _sheet_targets(zf: zipfile.ZipFile) -> tuple[dict[str, str], bool]:
    """sheet name -> zip member path, plus the 1904-date-system flag."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    date1904 = False
    pr = wb.find(f"{_NS}workbookPr")
    if pr is not None and pr.get("date1904", "0").lower() in ("1", "true"):
        date1904 = True
    rels = {}
    rel_root = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    for rel in rel_root.iter(f"{_REL_NS}Relationship"):
        target = rel.get("Target", "")
        if target.startswith("/"):
            target = target.lstrip("/")
        elif not target.startswith("xl/"):
            target = f"xl/{target}"
        rels[rel.get("Id")] = target
    sheets = {}
    for sh in wb.iter(f"{_NS}sheet"):
        rid = sh.get(_RID)
        if rid in rels:
            sheets[sh.get("name")] = rels[rid]
    return sheets, date1904


def sheet_names(path: str) -> list[str]:
    with zipfile.ZipFile(path) as zf:
        sheets, _ = _sheet_targets(zf)
    return list(sheets)


def _excel_number(raw: str, is_date: bool, date1904: bool) -> Any:
    """Numeric cell → float, or date/time/datetime when the style says
    so (util.rs:71-105 semantics, incl. the 1900 leap bug)."""
    num = float(raw)
    if not is_date:
        return int(num) if num.is_integer() else num
    if date1904:
        base = _dt.datetime(1904, 1, 1)
    else:
        base = _dt.datetime(1899, 12, 31)
        if abs(num - 60.0) < 1e-4:
            raise ValueError("bad date in Excel file - 2/29/1900 not valid")
        if num > 60.0:
            base -= _dt.timedelta(days=1)
    days = int(num)
    frac = num - days
    millis = round(frac * 86_400_000.0)
    when = base + _dt.timedelta(days=days, milliseconds=millis)
    if days == 0:
        return when.time()
    if when.time() == _dt.time(0, 0, 0):
        return when.date()
    return when


def stream_xlsx_rows(path: str, sheet_name: str | None = None) -> Iterator[list[Any]]:
    """Yield sheet rows as lists (None for empty cells), streaming one
    ``<row>`` element at a time. Skipped row numbers are emitted as
    empty lists so positions match what a user sees in Excel."""
    with zipfile.ZipFile(path) as zf:
        sheets, date1904 = _sheet_targets(zf)
        if not sheets:
            return
        if sheet_name is None:
            target = next(iter(sheets.values()))
        elif sheet_name in sheets:
            target = sheets[sheet_name]
        else:
            raise KeyError(f"no sheet named {sheet_name!r}; have {list(sheets)}")
        strings = _load_shared_strings(zf)
        date_styles = _load_date_styles(zf)

        want_row = 1
        with zf.open(target) as f:
            for _, el in ET.iterparse(f, events=("end",)):
                if _localname(el.tag) != "row":
                    continue
                row_num = int(el.get("r", str(want_row)))
                while want_row < row_num:  # simulate skipped rows
                    yield []
                    want_row += 1
                cells: list[Any] = []
                for c in el.findall(f"{_NS}c"):
                    ref = c.get("r")
                    idx = _col_index(ref) if ref else len(cells)
                    while len(cells) < idx:  # simulate skipped cells
                        cells.append(None)
                    cells.append(_cell_value(c, strings, date_styles, date1904))
                yield cells
                want_row += 1
                el.clear()


def _cell_value(c: ET.Element, strings: list[str], date_styles: list[bool], date1904: bool) -> Any:
    """Cell typing — ws.rs:325-366."""
    ctype = c.get("t", "n")
    if ctype == "inlineStr":
        is_el = c.find(f"{_NS}is")
        return "".join(t.text or "" for t in is_el.iter(f"{_NS}t")) if is_el is not None else None
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    raw = v.text
    if ctype == "s":
        return strings[int(raw)] if raw.isdigit() and int(raw) < len(strings) else raw
    if ctype == "str":
        return raw
    if ctype == "b":
        return raw != "0"
    if ctype == "e":
        return None  # error cells carry no usable value
    style = int(c.get("s", "0"))
    is_date = style < len(date_styles) and date_styles[style]
    return _excel_number(raw, is_date, date1904)


# ---------------------------------------------------------------------------
# writer — capability the reference explicitly lacks (fabrix-xl/src/lib.rs:3
# "write unsupported"); inverse of the reader's cell/date semantics above
# ---------------------------------------------------------------------------


def _col_letters(idx: int) -> str:
    """0-based column index -> 'A', 'BC', ... (inverse of _col_index)."""
    out = ""
    n = idx + 1
    while n:
        n, r = divmod(n - 1, 26)
        out = chr(65 + r) + out
    return out


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def _date_serial(value: Any) -> tuple[float, int]:
    """(serial, style index) for date/time/datetime values — exact
    inverse of _excel_number's 1900-system decoding, including the
    phantom-Feb-29 shift (serials >= 60 skip one)."""
    if isinstance(value, _dt.datetime):
        days = (value.date() - _dt.date(1899, 12, 31)).days
        if days >= 60:
            days += 1
        frac = (
            value.hour * 3600_000 + value.minute * 60_000 + value.second * 1000
            + value.microsecond // 1000
        ) / 86_400_000.0
        return days + frac, 2
    if isinstance(value, _dt.date):
        days = (value - _dt.date(1899, 12, 31)).days
        if days >= 60:
            days += 1
        return float(days), 1
    # datetime.time → fraction of a day, day part 0
    frac = (
        value.hour * 3600_000 + value.minute * 60_000 + value.second * 1000
        + value.microsecond // 1000
    ) / 86_400_000.0
    return frac, 3


def _cell_xml(ref: str, value: Any) -> str | None:
    if value is None:
        return None
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (_dt.datetime, _dt.date, _dt.time)):
        serial, style = _date_serial(value)
        num = repr(serial) if not float(serial).is_integer() else str(int(serial))
        return f'<c r="{ref}" s="{style}"><v>{num}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{_xml_escape(str(value))}</t></is></c>'


_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
</Relationships>"""

# cellXfs: 0 = general, 1 = date (numFmtId 14), 2 = datetime (22),
# 3 = time (21) — all inside the builtin date-format id set the
# reader's style heuristic recognizes
_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<fonts count="1"><font/></fonts><fills count="1"><fill/></fills>
<borders count="1"><border/></borders>
<cellStyleXfs count="1"><xf/></cellStyleXfs>
<cellXfs count="4">
<xf numFmtId="0" applyNumberFormat="0"/>
<xf numFmtId="14" applyNumberFormat="1"/>
<xf numFmtId="22" applyNumberFormat="1"/>
<xf numFmtId="21" applyNumberFormat="1"/>
</cellXfs>
</styleSheet>"""


def write_xlsx(
    rows: Iterator[list[Any]] | list[list[Any]],
    path: str,
    sheet_name: str = "Sheet1",
) -> int:
    """Write rows to a minimal .xlsx (inline strings, no shared-string
    table). Streams the worksheet part row by row — memory is bounded
    by one row, mirroring the reader. Returns the row count.

    The reference cannot write Excel at all (fabrix-xl/src/lib.rs:3);
    round-trip fidelity is pinned by tests against our own SAX reader."""
    n = 0
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        zf.writestr("xl/styles.xml", _STYLES)
        zf.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            f'<sheets><sheet name="{_xml_escape(sheet_name)}" sheetId="1" r:id="rId1"/></sheets>'
            "</workbook>",
        )
        with zf.open("xl/worksheets/sheet1.xml", "w") as f:
            f.write(
                b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                b'<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                b"<sheetData>"
            )
            for i, row in enumerate(rows, start=1):
                cells = [
                    c
                    for j, v in enumerate(row)
                    if (c := _cell_xml(f"{_col_letters(j)}{i}", v)) is not None
                ]
                f.write(f'<row r="{i}">{"".join(cells)}</row>'.encode())
                n += 1
            f.write(b"</sheetData></worksheet>")
    return n
