"""End-to-end flagship pipeline: Spark vs independent DuckDB oracle
(routed-row equality + per-sink aggregate counts, the north-rule
correctness gates) plus multi-sink fan-out write."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    for t in ["documents", "events", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def compare(spark_df, con, sql):
    a = spark_df.toPandas()
    b = con.execute(sql).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols, (sorted(b.columns), cols)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    return len(a)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_pipeline_queries_match_oracle(spark, sf_dir, oracle):
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    checked = 0
    for name in ["pipeline_aggregate", "pipeline_routed_rows", "pipeline_route_counts"]:
        n = compare(qs[name](spark, sf_dir), oracle, osql[name])
        assert n > 0
        checked += 1
    assert checked == 3


def test_route_counts_conserve_rows(spark, sf_dir, oracle):
    qs = entrymod.queries()
    total = qs["pipeline_route_counts"](spark, sf_dir).groupBy().sum("n").collect()[0][0]
    docs = oracle.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert total == docs


def test_multi_sink_write(spark, sf_dir, tmp_path):
    from vrl_spark.plans import weblog

    out = str(tmp_path / "sinks")
    df = weblog.routed_rows(spark, sf_dir)
    weblog.write_sinks(df, out)
    back = spark.read.parquet(out)
    assert back.count() == df.count()
    routes = {r["route"] for r in back.select("route").distinct().collect()}
    assert "dead_letter" in routes and "ok" in routes
