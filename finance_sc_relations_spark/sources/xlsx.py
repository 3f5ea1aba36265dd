"""Minimal xlsx reader (S1 completion) — pure stdlib, no openpyxl.

The reference loads its labeled datasets with pandas.read_excel
(src/sc_classifier/processing/data_manager.py:28-50,
src/relation_extraction/infer.py:368-413). This container has no xlsx
engine, but the format itself is just a zip of XML parts (ECMA-376):
xl/sharedStrings.xml holds the string table, xl/worksheets/sheet<N>.xml the
cell grid. This reader handles the subset those datasets use — inline/shared
strings, numbers, booleans, first row as header — which is exactly what
pandas.read_excel returns for them.

Scale note: xlsx inputs are small labeled datasets (thousands of rows), so
parsing happens driver-side into pandas and enters Spark via
createDataFrame — the same boundary the reference crosses.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET
from typing import List

import pandas as pd

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}


def _col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'AB3' -> 27."""
    letters = re.match(r"[A-Z]+", cell_ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _cell_value(cell, shared: List[str]):
    t = cell.get("t", "n")
    v = cell.find("m:v", _NS)
    if t == "inlineStr":
        is_el = cell.find("m:is", _NS)
        return "".join(x.text or "" for x in is_el.iter() if x.tag.endswith("}t"))
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return v.text == "1"
    if t == "str":
        return v.text
    # numeric: int when exact, else float (pandas.read_excel behavior)
    f = float(v.text)
    return int(f) if f.is_integer() else f


def read_xlsx_pandas(path: str, sheet: int = 1, header: bool = True) -> pd.DataFrame:
    """Parse sheet<N> of an xlsx file into a pandas DataFrame."""
    with zipfile.ZipFile(path) as zf:
        shared: List[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", _NS):
                shared.append(
                    "".join(t.text or "" for t in si.iter() if t.tag.endswith("}t"))
                )
        sheet_xml = zf.read(f"xl/worksheets/sheet{sheet}.xml")
    root = ET.fromstring(sheet_xml)
    rows = []
    max_col = 0
    for row_el in root.find("m:sheetData", _NS).findall("m:row", _NS):
        cells = {}
        for cell in row_el.findall("m:c", _NS):
            ci = _col_index(cell.get("r"))
            cells[ci] = _cell_value(cell, shared)
            max_col = max(max_col, ci)
        rows.append(cells)
    grid = [[r.get(c) for c in range(max_col + 1)] for r in rows]
    if header and grid:
        cols = [str(c) if c is not None else f"col{i}" for i, c in enumerate(grid[0])]
        return pd.DataFrame(grid[1:], columns=cols)
    return pd.DataFrame(grid)


def read_xlsx(spark, path: str, sheet: int = 1) -> "DataFrame":  # noqa: F821
    """xlsx -> Spark DataFrame via the driver-side pandas parse."""
    return spark.createDataFrame(read_xlsx_pandas(path, sheet=sheet))
