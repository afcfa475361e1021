"""Explicit skew handling (north_rule: "partitioning / shuffle / skew
handled explicitly").

Two levers, composable with AQE's runtime skew splitting:

- ``salted_agg``: two-phase aggregation for skewed group keys. Phase 1
  aggregates on (key, salt) — the hot key fans out over ``salt_buckets``
  reducers; phase 2 merges the partials on key alone. Phase 2 moves
  only ``buckets`` rows per key, so the hot key can no longer pin a
  single reducer. Works for any algebraic aggregate (sum/count/min/
  max; avg via sum+count).
- ``salted_repartition``: spread a skewed write/join key over
  key+salt partitions.

The pages host distribution is the test skew: 40% of rows share one
host (sources/pages.py)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic row salt in [0, buckets) — hash of the whole row's
    monotonically increasing id is NOT deterministic across runs, so we
    salt from a stable column hash when available; callers needing
    strict determinism pass their own salt expression."""
    return df.withColumn(
        salt_col, (F.spark_partition_id() * 1000 + F.monotonically_increasing_id()) % buckets
    )


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
    salt_expr: Column | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: out_name -> (fn, col) with fn in {count, sum, min, max}.
    The result is EXACTLY equal to the plain groupBy (checked by the
    dedicated oracle query) — salting changes the shuffle shape only.
    """
    salt = (
        salt_expr
        if salt_expr is not None
        else F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(buckets))
    )
    partial_aggs = []
    final_aggs = []
    for out, (fn, col) in aggs.items():
        p = f"_p_{out}"
        if fn == "count":
            partial_aggs.append(F.count(F.lit(1) if col == "*" else F.col(col)).alias(p))
            final_aggs.append(F.sum(p).alias(out))
        elif fn == "sum":
            partial_aggs.append(F.sum(col).alias(p))
            final_aggs.append(F.sum(p).alias(out))
        elif fn == "min":
            partial_aggs.append(F.min(col).alias(p))
            final_aggs.append(F.min(p).alias(out))
        elif fn == "max":
            partial_aggs.append(F.max(col).alias(p))
            final_aggs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} can't be salted")
    phase1 = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt").agg(*partial_aggs)
    return phase1.groupBy(*key_cols).agg(*final_aggs)


def salted_repartition(df: DataFrame, key_col: str, buckets: int = 16) -> DataFrame:
    """Repartition a skewed key over (key, salt) — downstream
    per-partition work sees bounded partition sizes."""
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(buckets))
    return df.withColumn("_salt", salt).repartition(F.col(key_col), F.col("_salt"))


def top_keys(df: DataFrame, key_col: str, n: int = 10) -> DataFrame:
    """Diagnostic: the hottest keys and their share (drives the choice
    of bucket count)."""
    total = df.count()
    return (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("rows"))
        .withColumn("share", F.round(F.col("rows") / total, 4))
        .orderBy(F.col("rows").desc())
        .limit(n)
    )
