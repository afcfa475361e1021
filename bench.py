"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the wall time of the flagship end-to-end pipeline
(parse->enrich->route->aggregate). Extra keys record docs/sec and
GB/s for the flagship, per the BASELINE.json metric.

Each query is forced with a noop-format write (full computation, no
driver collect bottleneck, no disk write skew).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from vrl_spark.session import get_spark  # noqa: E402


def force(df) -> float:
    t0 = time.time()
    df.write.mode("overwrite").format("noop").save()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    master = os.environ.get("BENCH_MASTER")  # e.g. local[8] for scaling runs
    spark = get_spark("vrl_spark_bench", master=master)

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # input volume for throughput numbers (pages text bytes)
    from vrl_spark.plans import weblog

    pages = weblog.load_pages(spark, sf_dir)
    stats = pages.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.octet_length("text") + F.octet_length("html")).alias("bytes"),
    ).collect()[0]
    n_docs, n_bytes = stats["rows"], stats["bytes"]

    results: dict[str, float] = {}
    # warm the JVM/parquet footing once
    force(weblog.load_pages(spark, sf_dir).select("url"))

    # amplified flagship: sf-dir row counts are overhead-dominated, so
    # also measure docs/sec on 100x input (materialized parquet scan ->
    # pipeline, the production shape; see bench_worker.py). Measured
    # right after the headline queries, before the heavy dedup runs.
    amp_stats = {}
    try:
        from bench_worker import materialize_pages

        amp = 100
        path = materialize_pages(spark, sf_dir, amp)
        pages = spark.read.parquet(path)
        amp_docs = pages.count()

        def amp_pipeline():
            df = spark.read.parquet(path)
            df = weblog.parse_stage(df)
            df = weblog.enrich_stage(spark, df)
            df = weblog.route_stage(df)
            return weblog.aggregate_stage(df)

        force(amp_pipeline())  # warmup
        # best-of-5: the host's CPU-steal windows can blanket several
        # consecutive reps; measured spread on an idle box is 1.4-7.4 s
        # for the same plan
        amp_best = min(force(amp_pipeline()) for _ in range(5))
        amp_stats = {
            "amplified_docs": amp_docs,
            "amplified_sec": round(amp_best, 3),
            "amplified_docs_per_sec": round(amp_docs / amp_best, 1),
        }
    except Exception as e:  # amplification failure shouldn't kill bench
        print(f"# bench amplified error: {e}", file=sys.stderr)


    # Ordering discipline: headline first (fresh JVM state, best-of-2),
    # then the light pure-JVM queries, then the heavy/pandas-UDF
    # queries LAST — heavy dedup runs fragment the heap and the first
    # pandas UDF spawns Python workers; both add 2-10x noise to any
    # pure-JVM query measured after them (observed: vrl_math_ip 2.1 s
    # alone vs 13-30 s measured right after vrl_crypto_codecs).
    headline = ["pipeline_aggregate", "pipeline_routed_rows", "pipeline_route_counts"]
    heavy = [
        "vrl_crypto_codecs", "similarity_lsh_ann", "dedup_ngram_jaccard",
        "dedup_minhash_lsh", "dedup_minhash_engine", "dedup_simhash",
    ]
    ordered = (
        [n for n in headline if n in qs]
        + sorted(n for n in qs if n not in headline and n not in heavy)
        + [n for n in heavy if n in qs]
    )
    for name in ordered:
        fn = qs[name]
        try:
            # best-of-2 for EVERYTHING: the sandbox host has multi-
            # second CPU-steal windows that inflate a single rep 10-30x
            # (observed text_lang_id: 36.8 s in-bench vs 0.4 s alone);
            # min-of-2 reps ~always dodges one bad window
            results[name] = round(
                min(force(fn(spark, sf_dir)) for _ in range(2)), 3
            )
        except Exception as e:  # a broken query shouldn't kill the bench
            results[name] = -1.0
            print(f"# bench error {name}: {e}", file=sys.stderr)
        # some operators persist intermediates (LSH shingle tables);
        # drop them so later measurements aren't paying their GC bill
        spark.catalog.clearCache()

    flagship = results.get("pipeline_aggregate", max(results.values()))

    out = {
        "metric": "e2e parse->enrich->route->aggregate wall time (flagship)",
        "value": flagship,
        "unit": "sec",
        "queries": results,
        "sf": sf_dir,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / flagship, 1) if flagship > 0 else None,
        "gb_per_sec": round(n_bytes / flagship / 1e9, 4) if flagship > 0 else None,
        "cores": spark.sparkContext.defaultParallelism,
        **amp_stats,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
