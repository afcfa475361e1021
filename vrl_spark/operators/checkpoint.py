"""Checkpoint / lineage / idempotent resume (north_rule: "resumable
from checkpoint with per-partition lineage + metrics").

Model (Iceberg-shaped, parquet-backed here):

- Work is chunked by a PARTITION KEY (for the weblog pipeline: the
  hour of warc_ts — the same key the sinks window on). A "run"
  processes a set of partitions.
- Each completed partition writes (a) its output under
  ``out/part=<k>`` and (b) one MANIFEST row: partition key, row/byte
  counts, stage metrics, content fingerprint. The manifest write
  happens AFTER the data write — a crashed run leaves data without a
  manifest row and the partition simply re-runs (data overwrite is
  idempotent: full re-write of that partition directory, the
  dynamic-partition-overwrite analogue of Iceberg's
  overwrite-by-filter).
- Resume = anti-join pending partitions against committed manifest
  keys: only unfinished partitions re-run.

At cluster scale the manifest is an Iceberg table and data writes are
``overwriteByFilter(part = k)``; the control flow is identical."""

from __future__ import annotations

import glob
import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class CheckpointedRun:
    out_dir: str
    partition_col: str = "part"

    @property
    def manifest_dir(self) -> str:
        return os.path.join(self.out_dir, "_manifest")

    def committed_keys(self, spark: SparkSession) -> set:
        """Committed = has a ``<key>.json`` manifest row. The glob
        filter keeps a torn ``.<key>.json.tmp`` from a crash between
        write and rename out of the read (a tmp is NOT a commit)."""
        if not os.path.isdir(self.manifest_dir):
            return set()  # no manifest yet — first run
        # a crash between makedirs and the first committed rename leaves
        # the dir with zero *.json files; spark.read.json would raise
        # "Unable to infer schema" — that state means "nothing committed"
        if not glob.glob(os.path.join(self.manifest_dir, "*.json")):
            return set()
        rows = (
            spark.read.option("pathGlobFilter", "*.json")
            .json(self.manifest_dir)
            .select("part_key")
            .collect()
        )
        return {r["part_key"] for r in rows}

    def pending(self, all_keys: list, spark: SparkSession) -> list:
        done = self.committed_keys(spark)
        return [k for k in all_keys if str(k) not in done]

    def run_partition(self, spark: SparkSession, df: DataFrame, key) -> dict:
        """Process one partition idempotently: overwrite its data dir,
        then commit the manifest row with lineage metrics."""
        part_df = df.where(F.col(self.partition_col) == key)
        data_dir = os.path.join(self.out_dir, f"{self.partition_col}={key}")
        t0 = time.time()
        part_df.write.mode("overwrite").parquet(data_dir)
        written = spark.read.parquet(data_dir)
        n_rows = written.count()
        metrics = {
            "part_key": str(key),
            "rows": n_rows,
            "wall_sec": round(time.time() - t0, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        os.makedirs(self.manifest_dir, exist_ok=True)
        # one json file per partition: commit is the atomic rename the
        # filesystem gives us; Iceberg swaps this for a snapshot commit
        path = os.path.join(self.manifest_dir, f"{key}.json")
        # dot-prefixed tmp: Spark's file index ignores hidden files, so
        # a crash between write and rename can never read as committed
        tmp = os.path.join(self.manifest_dir, f".{key}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(metrics, f)
        os.replace(tmp, path)
        return metrics

    def run(self, spark: SparkSession, df: DataFrame, all_keys: list) -> dict:
        """Process all pending partitions; returns run summary."""
        todo = self.pending(all_keys, spark)
        results = [self.run_partition(spark, df, k) for k in todo]
        return {
            "partitions_total": len(all_keys),
            "partitions_ran": len(todo),
            "partitions_skipped": len(all_keys) - len(todo),
            "rows_written": sum(r["rows"] for r in results),
        }


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "part=*")
    )
