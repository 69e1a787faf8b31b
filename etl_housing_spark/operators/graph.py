"""Iterative graph algorithms over edge-list DataFrames.

The corpus-curation use: build a kNN similarity graph over document
embeddings (q_knn_blocked's shape) and rank documents by centrality —
PageRank-weighted data selection keeps well-connected, "representative"
documents and demotes isolated near-garbage. The reference has no graph
surface; this extends the engine the same way connected-components dedup
(operators/dedup.py:163) does: pure DataFrame iteration, no GraphX/RDDs.

Scale design: each PageRank iteration is one equi-join (ranks ⋈ edges on
src — both sides hash-partitioned on the join key, so successive iterations
reuse the same shuffle layout) plus one partial-agg groupBy(dst). Dangling
mass (nodes with no out-edges) is a one-row aggregate broadcast back in-plan
— no collect() in the loop. Lineage is truncated with localCheckpoint every
few rounds, otherwise the plan tree grows exponentially and planning time
dominates; persist/unpersist keeps exactly two rank generations resident.
O(iterations) jobs, each O(|E|/p) per task: the textbook distributed
PageRank shape, good for any |E| that one shuffle can move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "degree_stats"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Power-iteration PageRank on a directed edge list.

    Returns ``(node, rank)`` with Σ rank = 1 (dangling-node mass is
    redistributed uniformly each round, the standard correction). Fixed
    iteration count keeps the result deterministic up to float summation
    order — callers needing convergence control can compare successive
    rank vectors themselves.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    # One setup-time action (like MLlib's iterative fits): N is a plan
    # constant for every subsequent iteration.
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))

    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).persist()
    # Pre-join the per-edge fan-out weight once; iterations then only join
    # ranks against this fixed, already-partitioned edge table.
    fanout = e.join(outdeg, "src").select("src", "dst", "outdeg").persist()
    fanout.count()

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).persist()
    base = (1.0 - damping) / n
    for i in range(iterations):
        recv = (
            fanout.join(ranks, fanout["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("w"))
            .groupBy("dst")
            .agg(F.sum("w").alias("recv"))
        )
        dangling = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass"))
        )
        new_ranks = (
            nodes.join(recv, nodes["node"] == recv["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("recv"), F.lit(0.0)) + F.col("dmass") / F.lit(float(n)))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            # Truncate lineage: without this the logical plan doubles per
            # round and Catalyst planning time dominates by iteration ~15.
            new_ranks = new_ranks.localCheckpoint(eager=True)
        else:
            new_ranks = new_ranks.persist()
            new_ranks.count()
        ranks.unpersist()
        ranks = new_ranks
    nodes.unpersist()
    outdeg.unpersist()
    fanout.unpersist()
    return ranks


def degree_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node in/out degree — the graph-shape sanity report (skew check:
    a max in-degree ≫ mean means the rank join needs salting at scale)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    o = e.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("out_deg"))
    i = e.groupBy(F.col("dst").alias("node")).agg(F.count(F.lit(1)).alias("in_deg"))
    return o.join(i, "node", "full").select(
        "node",
        F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
        F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
    )
