"""Link-graph analytics for web corpora: PageRank over a host/page
edge list — the canonical iterative web-corpus computation (used for
crawl prioritization and as a quality prior in corpus curation).

Not in the reference (VRL is per-event); this extends the iterative-
DataFrame-loop discipline established by dedup.dedup_clusters:

- per-iteration cost: one equi-join (edges x ranks) + one groupBy(dst)
  — both shuffles on node ids, never on payloads
- ranks are localCheckpoint-ed per iteration (lineage would otherwise
  grow exponentially; on a real cluster use checkpoint() to reliable
  storage)
- the dangling-mass term is ONE driver scalar per iteration (same
  footprint as dedup_clusters' convergence count)
- shuffle partitions are sized to the edge list, not the session's
  corpus-sized setting
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, rank) after ``iterations`` synchronous PageRank steps.

    rank'(v) = (1-d)/N + d * (sum over u->v of rank(u)/out(u)
                              + dangling_mass / N)

    Nodes = union of sources and destinations; duplicate edges should
    be deduped by the caller if they are not intended as weights
    (each copy contributes).
    """
    spark = edges.sparkSession
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).persist()
    n_edges = e.count()
    parts = int(max(1, min(2048, n_edges // 2_000_000 + 1)))
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        return _pr_loop(e, damping, iterations)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        e.unpersist()


def _pr_loop(e: DataFrame, d: float, iterations: int) -> DataFrame:
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    out_deg = e.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("out")
    ).localCheckpoint()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).localCheckpoint()
    for _ in range(iterations):
        dangling = (
            ranks.join(out_deg, ranks["node"] == out_deg["src"], "left_anti")
            .agg(F.sum("rank"))
            .collect()[0][0]
            or 0.0
        )
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(out_deg, "src")
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("out")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - d) / n)
                    + d * (F.coalesce(F.col("inflow"), F.lit(0.0))
                           + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
