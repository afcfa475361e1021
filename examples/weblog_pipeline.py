"""Runnable tour of the engine — the shapes a VRL user writes today,
re-expressed on this engine. Run: python examples/weblog_pipeline.py

Mirrors the reference's examples/simple.rs flow (compile once, run
over events), batch-sized for a laptop."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vrl_spark.pipeline import Pipeline
from vrl_spark.session import get_spark


def main() -> None:
    spark = get_spark("example", master="local[4]")

    # --- events, as a VRL user would see them -------------------------
    logs = spark.createDataFrame(
        [
            (1, '10.0.0.1 - alice [10/Oct/2020:13:55:36 +0000] "GET /index.html HTTP/1.1" 200 5120'),
            (2, '10.0.0.2 - bob [10/Oct/2020:13:55:37 +0000] "POST /api/v1 HTTP/1.1" 503 99'),
            (3, "this line matches nothing"),
        ],
        ["id", "message"],
    )

    # --- the "program": compile once, apply to all events -------------
    # VRL:  . |= parse_grok!(.message, "%{IPV4:ip} ... %{NONNEGINT:status} ...")
    #       .status = to_int!(.status)
    #       if .status >= 500 { route to errors } ...
    program = (
        Pipeline("demo")
        .parse_grok(
            "message",
            '%{IPV4:ip} - %{USER:user} \\[%{HTTPDATE:ts}\\] '
            '"%{WORD:method} %{URIPATH:path} HTTP/%{NUMBER:v}" '
            '%{NONNEGINT:status} %{NONNEGINT:bytes}',
            anchored=True,
        )
        .parse_timestamp("ts", "%d/%b/%Y:%H:%M:%S %z", "ts_parsed")
        .coerce("status", "int")
        .coerce("bytes", "int")
        .route(
            [("errors", F.col("status_int") >= 500)],
            otherwise="ok",
        )
    )
    print(program.explain())
    out = program.apply(logs)
    out.select("id", "route", "ip", "method", "status_int", "ts_parsed", "error").show(
        truncate=False
    )

    # --- stdlib functions compose as plain Column expressions ---------
    from vrl_spark.functions import codec, strings
    from vrl_spark.functions.presets import parse_user_agent

    spark.createDataFrame(
        [("Mozilla/5.0 (Windows NT 10.0) Chrome/120.0.0.0 Safari/537.36",)],
        ["ua"],
    ).select(
        parse_user_agent(F.col("ua")).alias("parsed"),
        strings.truncate(F.col("ua"), 24, "...").alias("short"),
        codec.md5(F.col("ua")).alias("hash"),
    ).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
