"""SparkSession factory with scale-oriented defaults.

Settings chosen for the 100 TB design point (and safe locally):

- AQE on (runtime coalescing, skew-join splitting) — the explicit
  skew lever required by the north rule alongside salting.
- Arrow execution for pandas UDFs (the only sanctioned Python path;
  per-row Python UDFs are banned in this engine).
- Session timezone pinned to UTC: VRL timestamps are always UTC
  (reference src/value/value.rs:56-57).
- shuffle.partitions defaults sized for local test runs; a real
  cluster deployment overrides via spark-submit --conf (AQE coalesces
  down, so oversizing is the safe direction at scale).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Tuned for the sandbox (local[32], 128 GiB). On a real cluster these
# are overridden on the submit command line; AQE makes the shuffle
# partition count self-correcting downward.
_DEFAULTS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "32",
    "spark.driver.memory": "48g",
    "spark.ui.enabled": "false",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
}


def get_spark(
    app_name: str = "vrl_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default
    all cores). Benchmarks pass explicit ``local[8]`` / ``local[32]``
    for the two-parallelism scaling-efficiency evidence.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
