"""Round-7 optimization harness (bench.py is FROZEN for measurement —
this file exists so the optimization work can time queries in
isolation, per spark_optimization_guide §1.4, without touching the
driver's contract).

Usage:
  python bench_extra.py q1 q2 ...          # time queries (min-of-N)
  python bench_extra.py --all              # every registry query
  python bench_extra.py --explain TAG q..  # also dump plans/r07/<q>_TAG.txt
  python bench_extra.py --reps 3 q..

Timing methodology matches bench.py exactly: construction + noop-sink
execution wall time, min over reps, spark.catalog.clearCache() between
queries. Jobs are labelled via setJobDescription.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vrl_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 2
    explain_tag = None
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--explain":
            explain_tag = args[i + 1]; i += 2
        elif a == "--all":
            names = ["--all"]; i += 1
        else:
            names.append(a); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("vrl_spark_bench_extra")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    if names == ["--all"]:
        names = sorted(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # warm JVM/parquet footing once, like bench.py
    from vrl_spark.plans import weblog

    spark.sparkContext.setJobDescription("warmup scan")
    weblog.load_pages(spark, sf_dir).select("url").write.mode(
        "overwrite").format("noop").save()

    results: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        if explain_tag is not None:
            os.makedirs("plans/r07", exist_ok=True)
            df = fn(spark, sf_dir)
            with open(f"plans/r07/{name}_{explain_tag}.txt", "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
            spark.catalog.clearCache()
        ts = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            ts.append(time.time() - t0)
            spark.catalog.clearCache()
        results[name] = round(min(ts), 3)
        samples[name] = [round(t, 3) for t in ts]
        print(f"# {name}: {results[name]} {samples[name]}", file=sys.stderr)
    print(json.dumps({"queries": results, "samples": samples,
                      "sf": sf_dir}))


if __name__ == "__main__":
    main()
