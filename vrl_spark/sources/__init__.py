"""Sources: parquet/Iceberg-style readers + deterministic synthetic
pages generation (Common-Crawl-style input per BASELINE.json
input_hint: url, warc_ts, html, text, lang)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def spread_scan(df: DataFrame) -> DataFrame:
    """Scale-adaptive scan fan-out (guide §2: make partitioning adapt
    to input size instead of trusting a constant).

    A parquet file with few row groups yields fewer scan splits than
    the machine has cores — the driver's test tables are single-row-
    group files, so EVERY downstream map stage (grok, Arrow UDFs,
    codecs) was serializing on one task regardless of core count.
    When the scan's split count is below the target, add one
    round-robin repartition (deterministic: sort-before-repartition
    stays on). The target defaults to HALF the cores — measured the
    local sweet spot across both workload shapes (map-heavy queries
    saturate by ~cores/2; join/loop-heavy queries pay per-task
    scheduling overhead per stage, so full-cores fan-out loses what
    the maps gain) — and is overridable via the
    ``spark.vrl.spreadTarget`` conf for cluster profiles. When the
    input is properly split — any real multi-row-group/multi-file
    table, i.e. the 100 TB case — this is a NO-OP costing only the
    getNumPartitions lookup, so nothing here is tuned to one box."""
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    target = int(spark.conf.get("spark.vrl.spreadTarget",
                                str(max(1, cores // 2))))
    parts = df.rdd.getNumPartitions()
    if parts >= target:
        return df
    return df.repartition(target)


def read_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Read one driver table; ``spread=True`` applies the adaptive
    fan-out. Opt-IN per call site: fan-out pays one shuffle plus
    per-stage task overhead, which measured as a net LOSS for light
    map/window/join queries and a 2-4x WIN wherever a CPU-heavy map
    stage (Arrow UDF codecs/hashing, wide regex chains) dominates —
    the per-query sweep in OPTIMIZATION_r07.md records which is
    which."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return spread_scan(df) if spread else df
