"""Event sessionization — the classic clickstream/webtext windowing op.

A session is a maximal run of one user's events with no gap exceeding
`gap_minutes`. One window pass computes the session boundaries (lag + a
cumulative sum of boundary flags), one groupBy aggregates per session —
exactly two shuffles on user_id, both map-side combinable, and the per-user
window never materializes more than a user's own events (skewed power users
are bounded by AQE skew handling on the groupBy).

No reference analog (the reference is document-centric); this extends the
§2.7 relational family for the events table the driver ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """events -> one row per (user, session):
    (user_id, session_idx, n_events, start_us, end_us, value_cents).

    session_idx is 0-based per user in time order; timestamps are emitted as
    unix MICROSECONDS (exact int64 — engine-portable, no format ambiguity);
    value totals as integer cents. Ordering ties on identical timestamps are
    broken by `order_tiebreak` so the result is deterministic."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(order_tiebreak).asc()
    )
    # parquet TIMESTAMP_NTZ: interpret the naive timestamp as UTC (the
    # session timezone) — unix_micros only accepts zoned timestamps
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap_us = gap_minutes * 60 * 1_000_000
    marked = events.withColumn(
        "_new_session",
        (
            F.coalesce(
                ts_us - F.lag(ts_us).over(w),
                F.lit(gap_us + 1),
            )
            > gap_us
        ).cast("long"),
    ).withColumn(
        "session_idx",
        F.sum("_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )
    return (
        marked.groupBy(user_col, "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_us).alias("start_us"),
            F.max(ts_us).alias("end_us"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "value_cents"
            ),
        )
        .select(
            F.col(user_col).alias("user_id"),
            "session_idx",
            "n_events",
            "start_us",
            "end_us",
            "value_cents",
        )
    )
