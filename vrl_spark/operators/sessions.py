"""Sessionization: gap-based session assignment over an event stream.

The classic two-window formulation (no UDFs, no iteration):
1. lag(ts) over (user, order by ts) -> new-session flag when the gap
   exceeds the timeout;
2. running sum of flags over the same window -> session index;
3. session_id = (user, index).

Shuffle profile at scale: ONE shuffle on user_id (both windows and
the final aggregate share the partitioning — Spark reuses the sort).
Skewed users (bots) are the usual hazard; cap session length or
pre-split hot users with the skew helpers if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Add ``session_seq`` (0-based per user) and ``session_id``."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_sec = int(gap_minutes * 60)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # microsecond precision: unix_timestamp would truncate sub-second
    # gaps and mis-split borderline sessions
    new_sess = (
        prev_ts.isNull()
        | (F.unix_micros(F.col(ts_col).cast('timestamp')) - F.unix_micros(prev_ts.cast('timestamp')) > gap_sec * 1_000_000)
    ).cast("long")
    out = df.withColumn("_new", new_sess)
    out = out.withColumn(
        "session_seq",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    ).drop("_new")
    return out.withColumn(
        "session_id",
        F.concat_ws("#", F.col(user_col).cast("string"), F.col("session_seq").cast("string")),
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Per-session rollup: bounds, event count, duration."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            (F.unix_micros(F.max(ts_col).cast('timestamp')) - F.unix_micros(F.min(ts_col).cast('timestamp')))
            / F.lit(1_000_000)
        ).cast("long").alias("duration_sec"),
    )
