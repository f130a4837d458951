"""Stdlib-only XLSX reader — closes the engine's one remaining
reference-parity environment gap (reference ``data/etl.py:51`` is
``pd.read_excel("Online Retail.xlsx")``; this container has no openpyxl,
so until round 9 the Excel adapter could only raise).

An .xlsx file is a ZIP of XML parts (ECMA-376 SpreadsheetML); the subset
a ``pd.read_excel`` of a data table exercises is small and fully
implementable with ``zipfile`` + ``xml.etree``:

- ``xl/workbook.xml`` + its ``.rels``: sheet names → part paths;
- ``xl/sharedStrings.xml``: the shared-string table (``t`` runs
  concatenated, so rich-text cells read as their plain text);
- ``xl/styles.xml``: per-cell style → number-format id, used ONLY to
  detect date/time formats (built-in ids 14–22 and 45–47, plus custom
  formats containing date tokens) — xlsx stores datetimes as serial
  numbers, meaning the TYPE lives in the style, not the cell;
- ``xl/worksheets/sheetN.xml``: rows of ``<c r="B7" t="s|str|b|inlineStr"
  s="...""><v>…</v></c>`` — the ``r`` attribute gives the column, so
  sparse rows and skipped cells land in the right position.

Driver-side by design, like every Excel reader: the format is a single
compressed XML stream with no row-group structure — inherently
non-splittable, appropriate for dimension-sized inputs only (the same
note the pandas adapter carries). The parsed rows are handed to
``spark.createDataFrame`` with a deterministically inferred schema.
"""

from __future__ import annotations

import datetime
import os
import re
import xml.etree.ElementTree as ET
import zipfile

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_REL_NS = {
    "r": "http://schemas.openxmlformats.org/package/2006/relationships"
}
_RID_ATTR = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)

#: built-in number-format ids that render as dates/times (ECMA-376 §18.8.30)
_DATE_NUMFMT_IDS = set(range(14, 23)) | {45, 46, 47}

#: custom format codes count as dates when they contain date tokens
#: (after stripping quoted literals, colors, and escapes)
_DATE_TOKEN_RE = re.compile(r"[ymdhs]", re.IGNORECASE)
_FMT_NOISE_RE = re.compile(r'"[^"]*"|\[[^\]]*\]|\\.')

#: Excel serial-date epochs. Default is the 1900 system, with its
#: phantom-leap-day offset folded in: serial 1 = 1900-01-01, and serials
#: > 59 are shifted by the nonexistent 1900-02-29 — anchoring at
#: 1899-12-30 makes modern dates exact, which is all a data table
#: contains. Mac-authored workbooks may declare the 1904 system
#: (workbookPr/@date1904) — dates there are 1462 days later; ignoring
#: the flag would silently shift every date by 4 years.
_EPOCH_1900 = datetime.datetime(1899, 12, 30)
_EPOCH_1904 = datetime.datetime(1904, 1, 1)


def _col_index(cell_ref: str) -> int:
    """'A1' → 0, 'AB17' → 27 (base-26 letters prefix)."""
    n = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
    return n - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    out = []
    for si in root.findall("m:si", _NS):
        out.append("".join(t.text or "" for t in si.iter(f"{{{_NS['m']}}}t")))
    return out


def _date_styles(zf: zipfile.ZipFile) -> set[int]:
    """Indices into cellXfs whose number format renders as a date/time."""
    try:
        data = zf.read("xl/styles.xml")
    except KeyError:
        return set()
    root = ET.fromstring(data)
    custom_date_ids = set()
    for fmt in root.iter(f"{{{_NS['m']}}}numFmt"):
        code = _FMT_NOISE_RE.sub("", fmt.get("formatCode", ""))
        if _DATE_TOKEN_RE.search(code):
            custom_date_ids.add(int(fmt.get("numFmtId")))
    date_styles = set()
    cellxfs = root.find("m:cellXfs", _NS)
    if cellxfs is None:
        return set()
    for i, xf in enumerate(cellxfs.findall("m:xf", _NS)):
        fmt_id = int(xf.get("numFmtId", "0"))
        if fmt_id in _DATE_NUMFMT_IDS or fmt_id in custom_date_ids:
            date_styles.add(i)
    return date_styles


def _date_epoch(zf: zipfile.ZipFile) -> datetime.datetime:
    """The workbook's serial-date epoch (1900 vs 1904 system)."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    pr = wb.find("m:workbookPr", _NS)
    if pr is not None and pr.get("date1904", "false").lower() in ("1", "true"):
        return _EPOCH_1904
    return _EPOCH_1900


def _sheet_part(zf: zipfile.ZipFile, sheet) -> str:
    """Resolve a sheet selector (index or name) to its XML part path."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    target_by_rid = {
        rel.get("Id"): rel.get("Target")
        for rel in rels.findall("r:Relationship", _REL_NS)
    }
    sheets = wb.find("m:sheets", _NS).findall("m:sheet", _NS)
    if isinstance(sheet, int):
        if not 0 <= sheet < len(sheets):
            raise ValueError(f"sheet index {sheet} out of range ({len(sheets)} sheets)")
        node = sheets[sheet]
    else:
        by_name = {s.get("name"): s for s in sheets}
        if sheet not in by_name:
            raise ValueError(
                f"sheet {sheet!r} not found; workbook has {sorted(by_name)}"
            )
        node = by_name[sheet]
    # OOXML rel targets are normally relative to xl/ ("worksheets/
    # sheet1.xml") but ECMA-376 also allows absolute-from-package-root
    # ("/xl/worksheets/sheet1.xml") — strip the leading '/' FIRST, then
    # prefix xl/ only when it's still missing.
    target = target_by_rid[node.get(_RID_ATTR)].lstrip("/")
    return target if target.startswith("xl/") else f"xl/{target}"


def _cell_value(c, shared: list[str], date_styles: set[int], epoch):
    t = c.get("t", "n")
    if t == "inlineStr":
        is_node = c.find("m:is", _NS)
        if is_node is None:
            return None
        return "".join(
            x.text or "" for x in is_node.iter(f"{{{_NS['m']}}}t")
        )
    v = c.find("m:v", _NS)
    if v is None or v.text is None:
        return None
    raw = v.text
    if t == "s":
        return shared[int(raw)]
    if t == "str":  # cached formula result, already a string
        return raw
    if t == "b":
        return raw == "1"
    if t == "e":  # error cell (#N/A etc.) → NULL, like pandas
        return None
    num = float(raw)
    if c.get("s") is not None and int(c.get("s")) in date_styles:
        return epoch + datetime.timedelta(days=num)
    if num.is_integer() and "." not in raw and "e" not in raw.lower():
        return int(raw)
    return num


def read_xlsx_rows(path: str, sheet=0) -> list[list]:
    """Parse one worksheet into a dense list-of-rows (ragged rows padded
    with None to the widest row; sparse cells positioned by their ``r``
    reference). Values: str | int | float | bool | datetime | None."""
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        date_styles = _date_styles(zf)
        epoch = _date_epoch(zf)
        part = _sheet_part(zf, sheet)
        root = ET.fromstring(zf.read(part))
        rows = []
        for row in root.iter(f"{{{_NS['m']}}}row"):
            out: list = []
            for c in row.findall("m:c", _NS):
                ref = c.get("r")
                idx = _col_index(ref) if ref else len(out)
                while len(out) < idx:
                    out.append(None)
                val = _cell_value(c, shared, date_styles, epoch)
                if len(out) == idx:
                    out.append(val)
                else:
                    out[idx] = val
            rows.append(out)
    width = max((len(r) for r in rows), default=0)
    return [r + [None] * (width - len(r)) for r in rows]


def _infer_spark_type(values):
    """Deterministic column typing over the observed python values —
    the widening lattice bool < long < double, anything mixed-with-string
    or empty → string, datetimes must be unanimous."""
    kinds = {type(v) for v in values if v is not None}
    if not kinds:
        return "string", lambda v: None
    if kinds == {bool}:
        return "boolean", lambda v: v
    if kinds <= {int}:
        return "long", lambda v: v
    if kinds <= {int, float}:
        return "double", lambda v: float(v) if v is not None else None
    if kinds == {datetime.datetime}:
        return "timestamp", lambda v: v
    return "string", lambda v: None if v is None else (
        str(v) if not isinstance(v, str) else v
    )


def read_excel_native(spark, path: str, sheet_name=0, header: bool = True):
    """``pd.read_excel`` semantics over the stdlib parser: first row as
    header (or generated col_N names), per-column inferred schema,
    returned as a Spark DataFrame (driver-parallelized — dimension-sized
    inputs only, see module docstring)."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"Source file not found: {path}")
    rows = read_xlsx_rows(path, sheet_name)
    if not rows:
        return spark.createDataFrame([], "value string")
    if header:
        names = [
            str(h) if h is not None else f"col_{i}"
            for i, h in enumerate(rows[0])
        ]
        body = rows[1:]
    else:
        names = [f"col_{i}" for i in range(len(rows[0]))]
        body = rows
    cols = list(zip(*body)) if body else [[] for _ in names]
    typed = [_infer_spark_type(col) for col in cols]
    schema = ", ".join(
        f"`{name}` {t}" for name, (t, _) in zip(names, typed)
    )
    data = [
        tuple(conv(v) for v, (_, conv) in zip(row, typed)) for row in body
    ]
    return spark.createDataFrame(data, schema)
