"""Enrichment tables — VRL's host-side enrichment semantics made
relational.

The reference defines the CONTRACT (the `Function` trait plugin
surface, src/compiler/function.rs:25-90; Vector's enrichment tables
implement find_table_row with key equality, case-insensitive option,
and date-range conditions). Spark lowering:

- `find_table_row`  -> broadcast LEFT join, FIRST match wins
  (deterministic: lowest dim row_id), optional case-insensitive keys,
  optional ``between`` date-range condition.
- `find_table_rows` -> broadcast left join keeping all matches
  (collect_list when a single row is wanted).

First-match-wins needs care relationally: a plain join with duplicate
dim keys DUPLICATES fact rows. We rank dim candidates per fact row
and keep rank 1 — at broadcast sizes this is a window over the
(small) join output, never a fact-stream shuffle."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def find_table_row(
    facts: DataFrame,
    table: DataFrame,
    on: list[tuple[str, str]],
    case_insensitive: bool = False,
    date_range: tuple[str, str, str] | None = None,
    fact_id: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Left-join ``table`` onto ``facts`` with first-match-wins.

    on: [(fact_col, dim_col), ...] equality conditions.
    date_range: (fact_ts_col, dim_from_col, dim_to_col) inclusive.
    fact_id: unique fact column for the first-match window; defaults
    to an internal monotonic id (deterministic within a plan).
    order_col: dim column defining "first" (table order in Vector);
    pass one for cross-run determinism — monotonically_increasing_id
    is only stable within a plan.
    """
    if order_col is not None:
        dim = table.withColumn("_dim_order", F.col(order_col))
    else:
        dim = table.withColumn("_dim_order", F.monotonically_increasing_id())
    drop_fact_id = False
    if fact_id is None:
        facts = facts.withColumn("_fact_id", F.monotonically_increasing_id())
        fact_id, drop_fact_id = "_fact_id", True

    cond = None
    for fc, dc in on:
        lhs, rhs = F.col(f"f.{fc}"), F.col(f"d.{dc}")
        if case_insensitive:
            lhs, rhs = F.lower(lhs), F.lower(rhs)
        c = lhs == rhs
        cond = c if cond is None else cond & c
    if date_range is not None:
        ts, lo, hi = date_range
        c = F.col(f"f.{ts}").between(F.col(f"d.{lo}"), F.col(f"d.{hi}"))
        cond = c if cond is None else cond & c

    joined = facts.alias("f").join(F.broadcast(dim).alias("d"), cond, "left")
    w = Window.partitionBy(F.col(f"f.{fact_id}")).orderBy(
        F.col("d._dim_order").asc_nulls_last()
    )
    out = (
        joined.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .drop("_rk", "_dim_order")
    )
    if drop_fact_id:
        out = out.drop("_fact_id")
    return out


def find_table_rows(
    facts: DataFrame,
    table: DataFrame,
    on: list[tuple[str, str]],
    case_insensitive: bool = False,
) -> DataFrame:
    """All matching dim rows per fact row (left join, may duplicate)."""
    cond = None
    for fc, dc in on:
        lhs, rhs = F.col(f"f.{fc}"), F.col(f"d.{dc}")
        if case_insensitive:
            lhs, rhs = F.lower(lhs), F.lower(rhs)
        c = lhs == rhs
        cond = c if cond is None else cond & c
    return facts.alias("f").join(F.broadcast(table).alias("d"), cond, "left")
