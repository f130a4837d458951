"""Stdlib xlsx reader (sources/xlsx.py): the Excel ingestion path no
longer env-gates on openpyxl. Workbooks here are hand-built
SpreadsheetML (zipfile + XML — the same parts Excel writes), covering
shared strings (incl. rich-text runs), inline strings, numbers, bools,
style-driven datetimes, sparse rows, multiple sheets, and the
reference-shaped retail table end-to-end through read_excel."""

from __future__ import annotations

import datetime
import os
import sys
import zipfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sales_etl_pipeline_spark.sources import xlsx  # noqa: E402
from sales_etl_pipeline_spark.sources.readers import read_excel  # noqa: E402

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def _workbook_xml(sheet_names):
    sheets = "".join(
        f'<sheet name="{n}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(sheet_names)
    )
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{sheets}</sheets></workbook>"
    )


def _workbook_rels(n_sheets):
    rels = "".join(
        f'<Relationship Id="rId{i + 1}" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        f'Target="worksheets/sheet{i + 1}.xml"/>'
        for i in range(n_sheets)
    )
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        f"{rels}</Relationships>"
    )


#: style 0 = general, style 1 = built-in datetime (numFmtId 22),
#: style 2 = custom date format
_STYLES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
    '<numFmts count="1"><numFmt numFmtId="164" formatCode="yyyy\\-mm\\-dd"/></numFmts>'
    '<cellXfs count="3">'
    '<xf numFmtId="0"/><xf numFmtId="22"/><xf numFmtId="164"/>'
    "</cellXfs></styleSheet>"
)


def _write_xlsx(path, sheets, shared_xml=None, styles_xml=_STYLES):
    """sheets: list of (name, sheetData inner XML)."""
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", _CT)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _workbook_xml([n for n, _ in sheets]))
        zf.writestr("xl/_rels/workbook.xml.rels", _workbook_rels(len(sheets)))
        if styles_xml:
            zf.writestr("xl/styles.xml", styles_xml)
        if shared_xml:
            zf.writestr("xl/sharedStrings.xml", shared_xml)
        for i, (_, body) in enumerate(sheets):
            zf.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                f"<sheetData>{body}</sheetData></worksheet>",
            )


_SHARED = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">'
    "<si><t>name</t></si>"
    "<si><t>plain</t></si>"
    # rich-text run: two <r><t> fragments must concatenate
    "<si><r><t>ri</t></r><r><t>ch</t></r></si>"
    "</sst>"
)


def test_cell_types_and_sparse_rows(spark, tmp_path):
    p = str(tmp_path / "t.xlsx")
    body = (
        # header: shared string + literals
        '<row r="1">'
        '<c r="A1" t="s"><v>0</v></c>'
        '<c r="B1" t="inlineStr"><is><t>n</t></is></c>'
        '<c r="C1" t="inlineStr"><is><t>x</t></is></c>'
        '<c r="D1" t="inlineStr"><is><t>flag</t></is></c>'
        '<c r="E1" t="inlineStr"><is><t>when</t></is></c>'
        "</row>"
        '<row r="2">'
        '<c r="A2" t="s"><v>1</v></c>'
        '<c r="B2"><v>42</v></c>'
        '<c r="C2"><v>2.5</v></c>'
        '<c r="D2" t="b"><v>1</v></c>'
        # 45658 days past 1899-12-30 = 2025-01-01; style 1 = datetime
        '<c r="E2" s="1"><v>45658.5</v></c>'
        "</row>"
        # sparse row: B skipped entirely, A is a rich-text shared string
        '<row r="3">'
        '<c r="A3" t="s"><v>2</v></c>'
        '<c r="C3"><v>7</v></c>'
        '<c r="D3" t="b"><v>0</v></c>'
        '<c r="E3" s="2"><v>45000</v></c>'
        "</row>"
    )
    _write_xlsx(p, [("Sheet1", body)], shared_xml=_SHARED)
    rows = xlsx.read_xlsx_rows(p)
    assert rows[0] == ["name", "n", "x", "flag", "when"]
    assert rows[1] == [
        "plain",
        42,
        2.5,
        True,
        datetime.datetime(2025, 1, 1, 12, 0),
    ]
    assert rows[2][0] == "rich" and rows[2][1] is None  # gap → None
    assert rows[2][4] == datetime.datetime(2023, 3, 15)  # custom date fmt

    df = read_excel(spark, p)
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string",
        "bigint",  # n = [42, None]: ints with a gap stay integral
        "double",  # x = [2.5, 7]: mixed int/float widens
        "boolean",
        "timestamp",
    ]
    got = {r["name"]: r for r in df.collect()}
    assert got["plain"]["n"] == 42 and got["rich"]["n"] is None
    assert got["plain"]["x"] == 2.5 and got["rich"]["x"] == 7.0
    assert got["plain"]["flag"] is True and got["rich"]["flag"] is False
    assert got["plain"]["when"] == datetime.datetime(2025, 1, 1, 12, 0)


def test_sheet_selection_by_index_and_name(spark, tmp_path):
    p = str(tmp_path / "multi.xlsx")
    s1 = '<row r="1"><c r="A1" t="inlineStr"><is><t>a</t></is></c></row>' \
         '<row r="2"><c r="A2"><v>1</v></c></row>'
    s2 = '<row r="1"><c r="A1" t="inlineStr"><is><t>b</t></is></c></row>' \
         '<row r="2"><c r="A2"><v>2</v></c></row>'
    _write_xlsx(p, [("First", s1), ("Second", s2)])
    assert read_excel(spark, p, sheet_name=0).columns == ["a"]
    assert read_excel(spark, p, sheet_name="Second").columns == ["b"]
    assert read_excel(spark, p, sheet_name="Second").first()["b"] == 2
    with pytest.raises(ValueError, match="not found"):
        read_excel(spark, p, sheet_name="Nope")
    with pytest.raises(ValueError, match="out of range"):
        read_excel(spark, p, sheet_name=5)


def test_reference_shaped_retail_workbook(spark, tmp_path):
    """An 'Online Retail'-shaped table (the reference's single source,
    etl.py:51/429): string/int/float/datetime columns with missing
    CustomerIDs — read_excel must produce a typed relation the cleaning
    stage can consume (nullable ids, exact amounts, real timestamps)."""
    p = str(tmp_path / "retail.xlsx")
    header = "".join(
        f'<c r="{c}1" t="inlineStr"><is><t>{n}</t></is></c>'
        for c, n in zip(
            "ABCDEF",
            ["InvoiceNo", "StockCode", "Quantity", "InvoiceDate",
             "UnitPrice", "CustomerID"],
        )
    )
    def row(r, invoice, stock, qty, serial, price, cust):
        cells = (
            f'<c r="A{r}" t="inlineStr"><is><t>{invoice}</t></is></c>'
            f'<c r="B{r}" t="inlineStr"><is><t>{stock}</t></is></c>'
            f'<c r="C{r}"><v>{qty}</v></c>'
            f'<c r="D{r}" s="1"><v>{serial}</v></c>'
            f'<c r="E{r}"><v>{price}</v></c>'
        )
        if cust is not None:
            cells += f'<c r="F{r}"><v>{cust}</v></c>'
        return f'<row r="{r}">{cells}</row>'

    body = (
        f'<row r="1">{header}</row>'
        + row(2, "536365", "85123A", 6, 44927.354166666664, 2.55, 17850)
        + row(3, "C536379", "D", -1, 44927.395833333336, 27.5, 14527)
        + row(4, "536366", "71053", 3, 44928.0, 3.39, None)  # missing id
    )
    _write_xlsx(p, [("Online Retail", body)])
    df = read_excel(spark, p)
    assert df.columns == [
        "InvoiceNo", "StockCode", "Quantity", "InvoiceDate",
        "UnitPrice", "CustomerID",
    ]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types["Quantity"] == "bigint"
    assert types["InvoiceDate"] == "timestamp"
    assert types["UnitPrice"] == "double"
    assert types["CustomerID"] == "bigint"
    rows = {r.InvoiceNo: r for r in df.collect()}
    assert rows["C536379"].Quantity == -1  # the cancellation row shape
    assert rows["536366"].CustomerID is None
    assert rows["536365"].InvoiceDate == datetime.datetime(2023, 1, 1, 8, 30)
    assert abs(rows["C536379"].UnitPrice - 27.5) < 1e-12
    # the P1 cleaning predicate (drop null CustomerID) works directly
    assert df.filter("CustomerID IS NOT NULL").count() == 2


def test_date1904_system(spark, tmp_path):
    """Mac-authored workbooks declare date1904 in workbookPr: the same
    serial must land 1462 days later than under the 1900 system."""
    p = str(tmp_path / "mac.xlsx")
    body = (
        '<row r="1"><c r="A1" t="inlineStr"><is><t>when</t></is></c></row>'
        '<row r="2"><c r="A2" s="1"><v>100</v></c></row>'
    )
    _write_xlsx(p, [("S", body)])
    # splice the date1904 flag into workbook.xml
    import shutil

    src = zipfile.ZipFile(p)
    p2 = str(tmp_path / "mac1904.xlsx")
    with zipfile.ZipFile(p2, "w") as out:
        for item in src.infolist():
            data = src.read(item.filename)
            if item.filename == "xl/workbook.xml":
                data = data.replace(
                    b"<sheets>", b'<workbookPr date1904="1"/><sheets>'
                )
            out.writestr(item, data)
    src.close()
    d1900 = xlsx.read_xlsx_rows(p)[1][0]
    d1904 = xlsx.read_xlsx_rows(p2)[1][0]
    assert (d1904 - d1900).days == 1462
    assert d1904 == datetime.datetime(1904, 1, 1) + datetime.timedelta(days=100)


def test_headerless_and_empty(spark, tmp_path):
    from sales_etl_pipeline_spark.sources.xlsx import read_excel_native

    p = str(tmp_path / "nohdr.xlsx")
    _write_xlsx(
        p,
        [("S", '<row r="1"><c r="A1"><v>5</v></c><c r="B1"><v>6</v></c></row>')],
    )
    df = read_excel_native(spark, p, header=False)
    assert df.columns == ["col_0", "col_1"]
    assert df.first()["col_0"] == 5
    p2 = str(tmp_path / "empty.xlsx")
    _write_xlsx(p2, [("S", "")])
    assert read_excel_native(spark, p2).count() == 0


def test_absolute_rel_target(spark, tmp_path):
    """ECMA-376 allows ABSOLUTE rel targets ('/xl/worksheets/sheet1.xml',
    emitted by some writers) alongside the usual xl/-relative form; the
    parser must not double-prefix them into 'xl/xl/...'."""
    p = str(tmp_path / "abs.xlsx")
    _write_xlsx(
        p,
        [("Sheet1", '<row r="1"><c r="A1"><v>7</v></c></row>')],
    )
    # rewrite the workbook rels to use an absolute target
    p2 = str(tmp_path / "abs2.xlsx")
    src = zipfile.ZipFile(p)
    with zipfile.ZipFile(p2, "w") as out:
        for item in src.namelist():
            data = src.read(item)
            if item == "xl/_rels/workbook.xml.rels":
                data = data.replace(
                    b'Target="worksheets/sheet1.xml"',
                    b'Target="/xl/worksheets/sheet1.xml"',
                )
            out.writestr(item, data)
    rows = xlsx.read_xlsx_rows(p2)
    assert rows == [[7.0]]
