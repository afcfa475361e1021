"""Idempotent checkpoint/resume semantics."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from vrl_spark.operators.checkpoint import CheckpointedRun, read_output


def make_df(spark):
    return spark.range(100).select(
        F.col("id"), (F.col("id") % 4).alias("part"), (F.col("id") * 2).alias("v")
    )


def test_full_run_then_resume_noop(spark, tmp_path):
    df = make_df(spark)
    run = CheckpointedRun(str(tmp_path / "out"))
    summary = run.run(spark, df, [0, 1, 2, 3])
    assert summary["partitions_ran"] == 4
    assert summary["rows_written"] == 100
    # resume: nothing pending, nothing re-runs
    summary2 = run.run(spark, df, [0, 1, 2, 3])
    assert summary2["partitions_ran"] == 0
    assert summary2["partitions_skipped"] == 4
    out = read_output(spark, run.out_dir)
    assert out.count() == 100


def test_crash_resume_reprocesses_only_missing(spark, tmp_path):
    df = make_df(spark)
    run = CheckpointedRun(str(tmp_path / "out"))
    # simulate a run that died after 2 partitions
    run.run_partition(spark, df, 0)
    run.run_partition(spark, df, 1)
    # a crashed partition: data written but manifest missing
    df.where(F.col("part") == 2).write.mode("overwrite").parquet(
        os.path.join(run.out_dir, "part=2")
    )
    summary = run.run(spark, df, [0, 1, 2, 3])
    assert summary["partitions_ran"] == 2  # 2 (re-done idempotently) and 3
    out = read_output(spark, run.out_dir)
    assert out.count() == 100
    # no duplicated rows from the re-run
    assert out.select("id").distinct().count() == 100


def test_empty_manifest_dir_resumes_cleanly(spark, tmp_path):
    """Crash between makedirs and the first committed rename: manifest
    dir exists but holds zero *.json files (possibly a torn .tmp) —
    committed_keys must return empty, not raise AnalysisException."""
    df = make_df(spark)
    run = CheckpointedRun(str(tmp_path / "out"))
    os.makedirs(run.manifest_dir, exist_ok=True)
    with open(os.path.join(run.manifest_dir, ".0.json.tmp"), "w") as f:
        f.write('{"part_key": "0"')  # torn write, not committed
    assert run.committed_keys(spark) == set()
    summary = run.run(spark, df, [0, 1, 2, 3])
    assert summary["partitions_ran"] == 4
    assert read_output(spark, run.out_dir).count() == 100


def test_manifest_metrics(spark, tmp_path):
    df = make_df(spark)
    run = CheckpointedRun(str(tmp_path / "out"))
    m = run.run_partition(spark, df, 0)
    assert m["rows"] == 25
    committed = run.committed_keys(spark)
    assert committed == {"0"}


def test_manifest_lineage_fingerprint(spark, tmp_path):
    """Opt-in bytes + fingerprint land in the manifest; the
    fingerprint is order-independent and re-run-stable, and matches
    an independent lineage_metrics() recompute over the output."""
    from vrl_spark.operators.checkpoint import lineage_metrics

    df = make_df(spark).withColumn("txt", F.concat(F.lit("row-"), F.col("id")))
    run = CheckpointedRun(str(tmp_path / "out"))
    m = run.run_partition(
        spark, df, 0, payload_col="txt", fp_cols=["id", "v", "txt"]
    )
    assert m["rows"] == 25
    # payload bytes: ids 0,4,...,96 → 'row-0'..'row-96' (5 or 6 chars)
    exp_bytes = sum(len(f"row-{i}") for i in range(0, 100, 4))
    assert m["bytes"] == exp_bytes
    # independent recompute over what landed on disk
    out = read_output(spark, run.out_dir).where(F.col("part") == 0)
    lm = lineage_metrics(
        out, [F.col("part")], F.col("txt"),
        [F.col("id"), F.col("v"), F.col("txt")],
    ).collect()[0]
    assert lm["fingerprint"] == m["fingerprint"]
    assert lm["n_bytes"] == m["bytes"]
    # order-independence: shuffled input, same partition content
    m2 = CheckpointedRun(str(tmp_path / "out2")).run_partition(
        spark, df.repartition(7).sortWithinPartitions(F.col("v").desc()),
        0, payload_col="txt", fp_cols=["id", "v", "txt"],
    )
    assert m2["fingerprint"] == m["fingerprint"]
    # sensitivity: a single changed row flips the fingerprint
    df3 = df.withColumn(
        "v", F.when(F.col("id") == 4, F.lit(999)).otherwise(F.col("v"))
    )
    m3 = CheckpointedRun(str(tmp_path / "out3")).run_partition(
        spark, df3, 0, payload_col="txt", fp_cols=["id", "v", "txt"]
    )
    assert m3["fingerprint"] != m["fingerprint"]
    # duplicate-pair sensitivity (the reason the fold is a modular
    # SUM, not bit_xor, where h XOR h = 0 would cancel): adding two
    # identical copies of a row must change the fingerprint
    dup_rows = df.where(F.col("id") == 4)
    df4 = df.union(dup_rows).union(dup_rows)
    m4 = CheckpointedRun(str(tmp_path / "out4")).run_partition(
        spark, df4, 0, payload_col="txt", fp_cols=["id", "v", "txt"]
    )
    assert m4["rows"] == 27
    assert m4["fingerprint"] != m["fingerprint"]


def test_verify_recertifies_partitions(spark, tmp_path):
    """verify() passes on untouched partitions and pinpoints the one
    whose data was tampered with after its manifest committed."""
    import shutil

    df = make_df(spark).withColumn("txt", F.concat(F.lit("row-"), F.col("id")))
    run = CheckpointedRun(str(tmp_path / "out"))
    run.run(spark, df, [0, 1], payload_col="txt", fp_cols=["id", "v", "txt"])
    ok = run.verify(spark, payload_col="txt", fp_cols=["id", "v", "txt"])
    assert [r["ok"] for r in ok] == [True, True]
    # tamper: swap partition 1's data for partition 0's rows
    p0 = os.path.join(run.out_dir, "part=0")
    p1 = os.path.join(run.out_dir, "part=1")
    shutil.rmtree(p1)
    shutil.copytree(p0, p1)
    res = {r["part_key"]: r["ok"] for r in run.verify(
        spark, payload_col="txt", fp_cols=["id", "v", "txt"]
    )}
    assert res == {"0": True, "1": False}
    # deletion (the most basic tamper): the audit reports it and
    # still certifies the intact partition instead of crashing
    shutil.rmtree(p1)
    res2 = {r["part_key"]: r for r in run.verify(
        spark, payload_col="txt", fp_cols=["id", "v", "txt"]
    )}
    assert res2["0"]["ok"] is True
    assert res2["1"]["ok"] is False and "error" in res2["1"]
    # payload tampering alone (fingerprint cols unchanged) is caught
    # by the byte comparison
    run3 = CheckpointedRun(str(tmp_path / "out5"))
    run3.run_partition(spark, df, 0, payload_col="txt", fp_cols=["id"])
    df_t = df.withColumn(
        "txt", F.when(F.col("id") == 4, F.lit("TAMPERED-LONGER"))
        .otherwise(F.col("txt"))
    )
    df_t.where(F.col("part") == 0).write.mode("overwrite").parquet(
        os.path.join(run3.out_dir, "part=0")
    )
    v3 = run3.verify(spark, payload_col="txt", fp_cols=["id"])[0]
    assert v3["ok"] is False
    assert v3["bytes_actual"] != v3["bytes_expected"]
