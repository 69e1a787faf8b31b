"""Graph queries over the embedding kNN similarity graph (round 3).

The corpus-curation story: q_knn_blocked's top-3-neighbor join defines a
directed similarity graph over documents; centrality on that graph
(PageRank) ranks documents by how "representative" they are — a published
data-selection signal — and the degree profile is the skew diagnostic that
says whether the rank-propagation join needs salting at scale.

``q_graph_degree`` is fully oracle-checked (the edge construction and the
degree aggregation are both plain SQL). ``q_pagerank`` registers rows-only:
its per-iteration float sums are order-dependent by nature; the value-level
check lives in tests/test_operators.py against a NumPy power iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import graph as G
from .registry import query

# Shared kNN edge construction (q_knn_blocked's shape, k=3 within label block).
_EDGE_SQL = """
    WITH scored AS (
      SELECT q.vec_id AS src, e.vec_id AS dst,
             ROUND(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                    CAST(e.embedding AS DOUBLE[])), 6) AS score
      FROM embeddings q JOIN embeddings e
        ON q.label = e.label AND q.vec_id <> e.vec_id),
    edges AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src ORDER BY score DESC, dst) AS rk
        FROM scored) t
      WHERE rk <= 3)
"""


def _knn_edges(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    from ..functions import vectors as V

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(F.col("vec_id").alias("src"), F.col("embedding").alias("q_emb"), "label")
    e = emb.select(F.col("vec_id").alias("dst"), F.col("embedding").alias("n_emb"), "label")
    scored = (
        q.join(e, "label")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", F.round(V.dot_seq(F.col("q_emb"), F.col("n_emb")), 6).alias("score"))
    )
    w = Window.partitionBy("src").orderBy(F.desc("score"), "dst")
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).select(
        "src", "dst"
    )


@query(
    "q_graph_degree",
    oracle=_EDGE_SQL
    + """
    SELECT COALESCE(o.node, i.node) AS node,
           COALESCE(o.out_deg, 0) AS out_deg,
           COALESCE(i.in_deg, 0) AS in_deg
    FROM (SELECT src AS node, COUNT(*) AS out_deg FROM edges GROUP BY src) o
    FULL JOIN (SELECT dst AS node, COUNT(*) AS in_deg FROM edges GROUP BY dst) i
      ON o.node = i.node
    """,
    description="degree profile of the embedding kNN similarity graph (out-degree "
    "is k by construction; the in-degree distribution is the hub/skew diagnostic "
    "that decides whether rank propagation needs salting): blocked kNN join + two "
    "grouped counts + one full outer join on the node key",
    tags=("graph", "vector"),
)
def q_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _knn_edges(spark, sf_dir)
    return G.degree_stats(edges).select(
        "node",
        F.col("out_deg").cast("bigint").alias("out_deg"),
        F.col("in_deg").cast("bigint").alias("in_deg"),
    )


@query(
    "q_pagerank",
    # rows-only: each power iteration sums float contributions in partition
    # order, so cross-engine bit-parity is not defined; the numeric contract
    # (matches NumPy power iteration to 1e-9, Σrank = 1) is enforced in
    # tests/test_operators.py.
    oracle=None,
    description="PageRank centrality over the embedding kNN graph (centrality-"
    "weighted data selection): 6 power iterations, dangling mass redistributed "
    "in-plan via a one-row broadcast aggregate, localCheckpoint lineage "
    "truncation — per iteration one equi-join on a reused partitioning + one "
    "partial-agg shuffle; returns (node, rank) with ranks summing to 1",
    tags=("graph", "vector"),
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _knn_edges(spark, sf_dir)
    pr = G.pagerank(edges, damping=0.85, iterations=6)
    return pr.select("node", F.round("rank", 8).alias("rank"))
