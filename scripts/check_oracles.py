#!/usr/bin/env python
"""Local mirror of the driver's correctness gate: run every queries() entry
on sf0.01 and compare against its oracle_sql() through DuckDB (row count,
column names, exact values; floats compared exactly after engine-side
rounding). Usage: python scripts/check_oracles.py [query ...]"""
import sys, traceback
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import duckdb, pandas as pd, numpy as np
import __spark_entry__ as E
from finance_sc_relations_spark.session import build_session

SF = "/root/testdata/sf0.01"
spark = build_session(master="local[8]")
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def norm(df):
    # Column-sort + row-sort only. NO dtype coercion: the driver's value hash
    # sees dtype differences (DuckDB HUGEINT -> float64/object, DATE vs
    # datetime64), so any coercion here hides real hash failures (r01 lesson).
    df = df[sorted(df.columns)].copy()
    sort_cols = [c for c in df.columns if df[c].dtype != object or df[c].map(lambda v: isinstance(v, (str, type(None)))).all()]
    return df.sort_values(by=sort_cols or list(df.columns), kind="mergesort").reset_index(drop=True)

# extras: oracle-checked HERE (and in pytest) but parked outside the
# driver-facing registry, which the driver truncates at 50 entries
qs, oracles = dict(E.queries()), dict(E.oracle_sql())
qs.update(E.extra_queries())
oracles.update(E.extra_oracle_sql())
only = sys.argv[1:] or None
for name, fn in qs.items():
    if only and name not in only: continue
    try:
        sdf = fn(spark, SF)
        spdf = sdf.toPandas()
        if name not in oracles:
            print(f"{name:24s} ROWS_ONLY rows={len(spdf)}")
            continue
        odf = con.execute(oracles[name]).df()
        a, b = norm(spdf), norm(odf)
        if len(a) != len(b):
            print(f"{name:24s} ROWCOUNT MISMATCH spark={len(a)} oracle={len(b)}")
            continue
        if list(a.columns) != list(b.columns):
            print(f"{name:24s} SCHEMA MISMATCH {list(a.columns)} vs {list(b.columns)}")
            continue
        dtype_diff = [
            (c, str(a[c].dtype), str(b[c].dtype))
            for c in a.columns
            if str(a[c].dtype) != str(b[c].dtype)
        ]
        if dtype_diff:
            print(f"{name:24s} DTYPE MISMATCH {dtype_diff}")
            continue
        mismatch = None
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            eq = av == bv
            if hasattr(eq, "all") and not eq.all():
                if np.issubdtype(a[c].dtype, np.floating):
                    both_nan = pd.isna(a[c]) & pd.isna(b[c])
                    if (eq | both_nan.values).all():
                        continue
                mismatch = c; break
        print(f"{name:24s} {'OK rows=' + str(len(a)) if not mismatch else 'VALUE MISMATCH col=' + mismatch}")
        if mismatch:
            for c in [mismatch.split(' ')[0]]:
                diff = a[c] != b[c]
                print(a[diff].head(3)); print(b[diff].head(3))
    except Exception as ex:
        print(f"{name:24s} ERROR {type(ex).__name__}: {ex}")
        traceback.print_exc(limit=3)
spark.stop()
