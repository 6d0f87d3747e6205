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

__all__ = ["stream_xlsx_rows", "sheet_names"]

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
