"""One benchmark measurement in a fresh JVM: run the flagship
pipeline on amplified input at a given master, print one JSON line.

Usage: python bench_worker.py local[8] <amplification> [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def amplified_pages(spark, sf_dir: str, amp: int):
    """documents replicated ``amp``x with distinct doc_ids, then the
    standard pages derivation — same per-row work as production."""
    from vrl_spark.sources.pages import derive_pages

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if amp > 1:
        reps = spark.range(amp).select(F.col("id").alias("rep"))
        docs = docs.crossJoin(reps).select(
            (F.col("doc_id") * amp + F.col("rep")).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
    return derive_pages(docs)


def materialize_pages(spark, sf_dir: str, amp: int) -> str:
    """Write the amplified pages table to parquet once (cached by amp)
    — benchmarks then measure scan -> pipeline like the production
    Iceberg read, with file-split parallelism."""
    cache = os.environ.get("BENCH_PAGES_DIR", "/tmp/vrl_spark_bench")
    path = os.path.join(cache, f"pages_amp{amp}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        # partition count scales with volume: 64 files = only 2 waves
        # on 32 cores, so ONE steal-hit task dominates the tail (the
        # probability that at least one of 32 concurrent tasks lands in
        # a steal window is ~1 on this host). ~8 waves of finer tasks
        # amortize hits — the same reason 100 TB jobs want
        # maxPartitionBytes sized for many waves per executor.
        n_parts = max(256, amp // 4)
        amplified_pages(spark, sf_dir, amp).repartition(n_parts).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def flagship_pipeline(spark, pages_path: str):
    """The flagship parse -> enrich -> route -> aggregate plan over a
    materialized pages table — THE stage chain every measurement lane
    (bench.py's amplified record, this worker, the scaling ladder)
    must share, so a stage change can't silently leave one lane
    measuring a different pipeline."""
    from vrl_spark.plans import weblog

    df = spark.read.parquet(pages_path)
    df = weblog.parse_stage(df)
    df = weblog.enrich_stage(spark, df)
    df = weblog.route_stage(df)
    return weblog.aggregate_stage(df)


def main() -> None:
    master = sys.argv[1]
    amp = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from vrl_spark.session import get_spark

    spark = get_spark("bench_scaling", master=master)

    pages_path = materialize_pages(spark, sf_dir, amp)
    pages = spark.read.parquet(pages_path)
    stats = pages.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.octet_length("text") + F.octet_length("html")).alias("bytes"),
    ).collect()[0]
    n_docs, n_bytes = stats["rows"], stats["bytes"]

    def pipeline():
        return flagship_pipeline(spark, pages_path)

    # warmup (JVM JIT + parquet footing)
    pipeline().write.mode("overwrite").format("noop").save()
    times = []
    for _ in range(reps):
        t0 = time.time()
        pipeline().write.mode("overwrite").format("noop").save()
        times.append(time.time() - t0)
    best = min(times)
    print(json.dumps({
        "master": master,
        "cores": spark.sparkContext.defaultParallelism,
        "docs": n_docs,
        "bytes": int(n_bytes),
        "times": [round(t, 3) for t in times],
        "best_sec": round(best, 3),
        "docs_per_sec": round(n_docs / best, 1),
        "gb_per_sec": round(n_bytes / best / 1e9, 4),
    }))


if __name__ == "__main__":
    main()
