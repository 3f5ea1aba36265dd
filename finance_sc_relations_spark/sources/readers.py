"""Suffix-dispatched file reader (S1).

Port of predict_frame/read_frame's format dispatch
(src/relation_extraction/infer.py:368-413,
src/relation_extraction/preprocessing_funcs.py:65-73,
src/sc_classifier/processing/data_manager.py:28-50) to spark.read:
tsv/csv/json/jsonl/parquet, plus xlsx via the stdlib zip/XML parser in
sources/xlsx.py (no JVM xlsx reader in-container; the reference used
pandas.read_excel — same driver-side boundary)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from .xlsx import read_xlsx

_READERS = {
    ".xlsx": lambda s, p: read_xlsx(s, p),
    ".csv": lambda s, p: s.read.option("header", True).option("inferSchema", True).csv(p),
    ".tsv": lambda s, p: s.read.option("header", True)
    .option("sep", "\t")
    .option("inferSchema", True)
    .csv(p),
    ".json": lambda s, p: s.read.option("multiLine", True).json(p),
    ".jsonl": lambda s, p: s.read.json(p),
    ".parquet": lambda s, p: s.read.parquet(p),
}


def read_frame(spark: SparkSession, path: str) -> DataFrame:
    suffix = Path(path).suffix.lower()
    if suffix not in _READERS:
        raise ValueError(
            f"Unsupported file type {suffix!r}; expected one of {sorted(_READERS)}"
        )
    return _READERS[suffix](spark, path)
