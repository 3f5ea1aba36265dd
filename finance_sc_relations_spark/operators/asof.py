"""As-of join — attach to every left row the most recent right row at or
before its timestamp, per key (the time-series enrichment operator the
DataFrame API lacks natively; DuckDB/kdb call it ASOF JOIN).

Spark realization: the union-sentinel window pattern — ONE shuffle total.
Tag both sides, union them, and per key take the running last non-null
right value in time order; left rows then read the right row "as of" their
own timestamp. No range join, no per-row lookup, no crossJoin: the window
is a single hash shuffle on the key and a per-key sort, so it scales like
any groupBy and AQE handles hot keys. (A broadcast-right variant is
pointless here — the window form is already one shuffle and handles an
arbitrarily large right side.)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str = "ts",
    value_cols: Sequence[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """left ⟕ASOF right on `by`: every left row gains the `value_cols` of
    the right row with the greatest right.ts <= left.ts for the same key
    (null when no prior right row exists).

    Equal timestamps are INCLUSIVE (a right row at exactly left.ts
    matches); among right rows sharing a timestamp the one with the
    greatest `tiebreak` wins (deterministic), or the last in window order
    if no tiebreak is given."""
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in (by, ts_col)
        ]
    l_tag = left.withColumn("_is_left", F.lit(1))
    for c in value_cols:
        if c in l_tag.columns:
            l_tag = l_tag.withColumnRenamed(c, f"_l_{c}")
        l_tag = l_tag.withColumn(f"_r_{c}", F.lit(None).cast(right.schema[c].dataType))
    r_cols = [
        by,
        ts_col,
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    ]
    if tiebreak is not None:
        l_tag = l_tag.withColumn(
            "_tb", F.lit(None).cast(right.schema[tiebreak].dataType)
        )
        r_cols.append(F.col(tiebreak).alias("_tb"))
    r_tag = right.select(*r_cols)
    for c in l_tag.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None))
    u = l_tag.unionByName(r_tag.select(l_tag.columns))
    # _is_left BEFORE the tiebreak: at equal ts every right row must sort
    # before every left row (inclusive match), THEN right rows order among
    # themselves by tiebreak so the greatest wins
    order = [F.col(ts_col).asc(), F.col("_is_left").asc()]
    if tiebreak is not None:
        order.append(F.col("_tb").asc_nulls_first())
    w = (
        Window.partitionBy(by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in value_cols
        ],
    )
    out = filled.filter(F.col("_is_left") == 1).drop(
        "_is_left", "_tb", *[f"_r_{c}" for c in value_cols]
    )
    for c in value_cols:
        out = out.withColumnRenamed(f"_asof_{c}", f"asof_{c}")
        if f"_l_{c}" in out.columns:
            out = out.withColumnRenamed(f"_l_{c}", c)
    return out
