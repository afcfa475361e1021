"""Query/oracle registry: every implemented operator from SURVEY.md §2
gets a (Spark callable, DuckDB oracle SQL) pair here.

The driver runs both sides at sf0.01 and compares row-count + schema +
order-insensitive value hash, so column NAMES and types must agree.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    _load()
    return dict(ORACLES)


_LOADED = False


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    # import for side effect: modules call register()
    from vrl_spark.plans import queries_weblog  # noqa: F401
    from vrl_spark.plans import queries_functions  # noqa: F401
    from vrl_spark.plans import queries_textops  # noqa: F401
    from vrl_spark.plans import queries_breadth  # noqa: F401

    _LOADED = True
