"""Funnel analysis over an event stream: how many users progress
through an ordered sequence of step types (view -> click -> ...),
matching steps greedily in event-time order — the classic product/
telemetry rollup a log pipeline feeds.

Scale shape: one groupBy(user) collects each user's (ts, type) pairs
(bounded by per-user activity, the same contract as sessionization),
the subsequence match runs as a JVM ``aggregate`` fold over the
sorted array (no Python, no window re-sort), and the final rollup is
a tiny groupBy on the step index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(step_idx, step_name, n_users) with n_users = users whose event
    sequence contains steps[0..step_idx-1] as an ordered subsequence
    (greedy earliest-match). Events sort by (ts, type string) — the
    struct array_sort order — so ties at the same timestamp resolve
    deterministically by type. Steps no user reaches are omitted."""
    if not steps:
        raise ValueError("steps must be non-empty")
    step_arr = F.array(*[F.lit(s) for s in steps])
    per_user = (
        events.select(
            F.col(user_col).alias("user"),
            F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("t")).alias(
                "ev"
            ),
        )
        .groupBy("user")
        .agg(F.array_sort(F.collect_list("ev")).alias("evs"))
        .select(
            "user",
            F.aggregate(
                F.transform(F.col("evs"), lambda e: e.getField("t")),
                F.lit(0),
                lambda acc, t: F.when(
                    (acc < len(steps)) & (t == F.try_element_at(step_arr, acc + 1)),
                    acc + 1,
                ).otherwise(acc),
            ).alias("max_step"),
        )
    )
    counts = per_user.groupBy("max_step").agg(
        F.count(F.lit(1)).alias("c")
    )
    # users reaching >= k: reverse cumulative sum over at most
    # len(steps)+1 rows — explode the tiny per-max-step counts
    # NB: sequence(1, 0) generates a DESCENDING [1, 0] in Spark — the
    # max_step=0 bucket must map to an empty list, not credit step 1
    idxs = F.when(
        F.col("max_step") >= 1, F.sequence(F.lit(1), F.col("max_step"))
    ).otherwise(F.array().cast("array<int>"))
    reached = (
        counts.select(F.explode(idxs).alias("step_idx"), "c")
        .groupBy("step_idx")
        .agg(F.sum("c").cast("long").alias("n_users"))
    )
    return reached.select(
        F.col("step_idx").cast("long").alias("step_idx"),
        F.try_element_at(step_arr, F.col("step_idx")).alias("step_name"),
        "n_users",
    )
