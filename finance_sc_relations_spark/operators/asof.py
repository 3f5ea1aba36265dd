"""As-of join — attach to every left row the most recent right row at or
before its timestamp, per key (the time-series enrichment operator the
DataFrame API lacks natively; DuckDB/kdb call it ASOF JOIN).

Spark realization: the union-sentinel window pattern — ONE shuffle total.
Tag both sides, union them, and per key take the running last non-null
right ROW in time order; left rows then read the right row "as of" their
own timestamp. No range join, no per-row lookup, no crossJoin: the window
is a single hash shuffle on the key and a per-key sort, so it scales like
any groupBy and AQE handles hot keys. (A broadcast-right variant is
pointless here — the window form is already one shuffle and handles an
arbitrarily large right side.)

All value columns are packed into ONE struct before the window fill, so
every asof_* output column comes from the SAME matched right row — a right
row that legitimately carries NULL in one value column contributes that
NULL (it does not fall back to an older row's value, and columns are never
blended across different right rows).
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
    (all null when no prior right row exists).

    Equal timestamps are INCLUSIVE (a right row at exactly left.ts
    matches); among right rows sharing a timestamp the one with the
    greatest `tiebreak` wins (deterministic), or the last in window order
    if no tiebreak is given. All asof_* columns are taken from that single
    winning row — NULL fields of the winning row stay NULL."""
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in (by, ts_col)
        ]
    # Right rows carry ONE struct of all value columns; the struct itself
    # is non-null on every right row (even when every field is null), so
    # last(..., ignorenulls=True) selects the most recent right ROW and
    # its fields travel together.
    r_cols = [
        by,
        ts_col,
        F.lit(0).alias("_is_left"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("_r_pack"),
    ]
    if tiebreak is not None:
        r_cols.append(F.col(tiebreak).alias("_tb"))
    r_tag = right.select(*r_cols)
    pack_type = r_tag.schema["_r_pack"].dataType

    l_tag = left.withColumn("_is_left", F.lit(1))
    for c in value_cols:
        if c in l_tag.columns:
            l_tag = l_tag.withColumnRenamed(c, f"_l_{c}")
    l_tag = l_tag.withColumn("_r_pack", F.lit(None).cast(pack_type))
    if tiebreak is not None:
        l_tag = l_tag.withColumn(
            "_tb", F.lit(None).cast(right.schema[tiebreak].dataType)
        )
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
    filled = u.withColumn(
        "_asof_pack", F.last("_r_pack", ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("_is_left") == 1).select(
        *[c for c in l_tag.columns if c not in ("_is_left", "_tb", "_r_pack")],
        *[F.col("_asof_pack").getField(c).alias(f"asof_{c}") for c in value_cols],
    )
    for c in value_cols:
        if f"_l_{c}" in out.columns:
            out = out.withColumnRenamed(f"_l_{c}", c)
    return out
