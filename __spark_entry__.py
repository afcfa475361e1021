"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship parse->enrich->route->aggregate
pipeline at sf0.001. ``queries()``/``oracle_sql()`` pair every
implemented operator with a DuckDB-checkable oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from vrl_spark.plans import weblog

    return weblog.full_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from vrl_spark import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    from vrl_spark import registry

    return registry.oracle_sql()
