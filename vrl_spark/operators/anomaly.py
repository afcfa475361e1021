"""Windowed anomaly detection over event telemetry: per-entity error
rates scored against the entity's OWN trailing baseline (z-score) —
the alerting rollup a log pipeline feeds after route/aggregate.

Scale shape: one groupBy (entity, bucket) for the rates, then one
window sort per entity for the trailing frame — the same single
key-shuffle + sort contract as sessionization; frames are ROWS-based
so state per row is O(trailing_n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def error_rate_anomalies(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    error_type: str = "error",
    bucket: str = "day",
    trailing: int = 3,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Per (entity, bucket): total events, error count, error rate,
    trailing-mean/std of the previous ``trailing`` buckets, z-score,
    and the anomaly verdict (|z| > threshold, requiring a full
    trailing frame with nonzero spread).

    Rates are exact rationals (int/int); the trailing stats use a
    deterministic ROWS frame in bucket order, so the result is
    reproducible run-to-run and engine-to-engine.
    """
    bucketed = events.select(
        F.col(entity_col).alias("entity"),
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
        (F.col(type_col) == error_type).cast("long").alias("is_err"),
    )
    rates = bucketed.groupBy("entity", "bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("is_err").alias("n_errors"),
    ).withColumn(
        "err_rate", F.col("n_errors").cast("double") / F.col("n_events")
    )
    w = (
        Window.partitionBy("entity")
        .orderBy("bucket")
        .rowsBetween(-trailing, -1)
    )
    out = rates.select(
        "entity", "bucket", "n_events", "n_errors", "err_rate",
        F.avg("err_rate").over(w).alias("trail_mean"),
        F.stddev("err_rate").over(w).alias("trail_std"),
        F.count(F.lit(1)).over(w).alias("_frame_n"),
    )
    z = (F.col("err_rate") - F.col("trail_mean")) / F.col("trail_std")
    full = F.col("_frame_n") == trailing
    spread = F.col("trail_std") > 0
    # zero-spread baseline: a constant history then ANY deviation is an
    # anomaly (z is infinite; reported as NULL)
    flat_break = full & ~spread & (F.col("err_rate") != F.col("trail_mean"))
    return out.select(
        "entity", "bucket", "n_events", "n_errors", "err_rate",
        "trail_mean", "trail_std",
        F.when(full & spread, z).alias("z"),
        F.when((full & spread & (F.abs(z) > z_threshold)) | flat_break, True)
        .otherwise(False).alias("is_anomaly"),
    )
