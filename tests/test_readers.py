"""S1 file-reader dispatch, including the stdlib xlsx path."""

import zipfile

import pytest

from finance_sc_relations_spark.sources.readers import read_frame
from finance_sc_relations_spark.sources.xlsx import read_xlsx_pandas

_SHEET = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>
<row r="2"><c r="A2" t="s"><v>3</v></c><c r="B2"><v>42</v></c><c r="C2"><v>2.5</v></c></row>
<row r="3"><c r="A3" t="inlineStr"><is><t>Beta Inc</t></is></c><c r="B3"><v>7</v></c><c r="C3" t="b"><v>1</v></c></row>
</sheetData></worksheet>"""

_SHARED = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
<si><t>Sentence</t></si><si><t>count</t></si><si><t>score</t></si><si><t>Acme Corp supplies Beta</t></si></sst>"""


def _write_xlsx(path):
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>',
        )
        zf.writestr("xl/sharedStrings.xml", _SHARED)
        zf.writestr("xl/worksheets/sheet1.xml", _SHEET)


def test_read_xlsx_pandas(tmp_path):
    p = tmp_path / "data.xlsx"
    _write_xlsx(p)
    pdf = read_xlsx_pandas(str(p))
    assert list(pdf.columns) == ["Sentence", "count", "score"]
    assert pdf.iloc[0]["Sentence"] == "Acme Corp supplies Beta"
    assert pdf.iloc[0]["count"] == 42 and pdf.iloc[0]["score"] == 2.5
    assert pdf.iloc[1]["Sentence"] == "Beta Inc"  # inline string
    assert pdf.iloc[1]["score"] is True  # boolean cell


def test_read_frame_dispatch_xlsx_and_csv(spark, tmp_path):
    p = tmp_path / "data.xlsx"
    _write_xlsx(p)
    df = read_frame(spark, str(p))
    assert df.count() == 2
    assert "Sentence" in df.columns
    csv = tmp_path / "d.csv"
    csv.write_text("a,b\n1,x\n2,y\n")
    assert read_frame(spark, str(csv)).count() == 2
    with pytest.raises(ValueError):
        read_frame(spark, "nope.xyz")
