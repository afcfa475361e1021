"""Production driver: the spark-submit entry point.

    # package the engine, submit at any cluster size:
    python -m zipfile -c /tmp/vrl_spark.zip vrl_spark
    spark-submit --py-files /tmp/vrl_spark.zip run_pipeline.py \
        --input /root/testdata/sf0.1 --output /tmp/weblog_out \
        [--resume] [--verify] [--master local[32]]

Runs the flagship parse->enrich->route pipeline partitioned by hour,
through the checkpoint manager: each hour partition commits a
manifest row (rows, wall time) after its data lands; `--resume`
re-runs only uncommitted partitions. Aggregates land beside the
routed sinks. Exit code 0 only if all partitions committed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir with documents.parquet (or a pages parquet via --pages)")
    ap.add_argument("--pages", help="read an existing pages parquet instead of deriving")
    ap.add_argument("--output", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument("--resume", action="store_true",
                    help="skip partitions already committed in the manifest")
    ap.add_argument("--verify", action="store_true",
                    help="audit committed partitions against their "
                         "manifest lineage (rows/bytes/fingerprint) and "
                         "exit non-zero on any mismatch; no data is "
                         "written")
    args = ap.parse_args()

    from vrl_spark.operators.checkpoint import CheckpointedRun
    from vrl_spark.plans import weblog
    from vrl_spark.session import get_spark

    spark = get_spark("vrl_spark_pipeline", master=args.master)

    if args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        pages = weblog.load_pages(spark, args.input)
    df = weblog.parse_stage(pages)
    df = weblog.enrich_stage(spark, df)
    df = weblog.route_stage(df)
    routed = df.select(
        "doc_id", "url", "warc_ts", "route", "status_int", "bytes_int",
        "method", "level", "lang_norm", "lang_family", "error",
        F.date_format("warc_ts", "yyyyMMddHH").alias("part"),
    )

    run = CheckpointedRun(os.path.join(args.output, "routed"))
    if args.verify:
        results = run.verify(
            spark, payload_col="url",
            fp_cols=["doc_id", "url", "route", "status_int",
                     "bytes_int", "error"],
        )
        bad = [r for r in results if not r["ok"]]
        print(json.dumps({
            "partitions_audited": len(results),
            "partitions_ok": len(results) - len(bad),
            "failures": bad,
        }))
        return 0 if not bad else 1
    if not args.resume:
        # fresh run: clear any previous manifest so all partitions run
        import shutil

        shutil.rmtree(run.manifest_dir, ignore_errors=True)
    hours = [r["part"] for r in routed.select("part").distinct().collect()]
    # manifest rows carry bytes + the order-independent xxh64 content
    # fingerprint: a resumed run re-certifies identical partitions
    summary = run.run(
        spark, routed, sorted(hours),
        payload_col="url",
        fp_cols=["doc_id", "url", "route", "status_int", "bytes_int",
                 "error"],
    )

    # per-sink aggregates (idempotent overwrite)
    agg = weblog.aggregate_stage(df)
    agg.write.mode("overwrite").parquet(os.path.join(args.output, "aggregates"))

    summary["aggregate_rows"] = spark.read.parquet(
        os.path.join(args.output, "aggregates")
    ).count()
    print(json.dumps(summary))
    return 0 if summary["partitions_ran"] + summary["partitions_skipped"] == summary["partitions_total"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
