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
    # Materialized once: degree_stats consumes the edge list twice (out + in).
    edges = _knn_edges(spark, sf_dir).localCheckpoint(eager=True)
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
    "weighted data selection): 4 power iterations, dangling mass from a static "
    "is_dangling flag riding the cached rank frame (zero per-round joins for "
    "the correction), one-row broadcast aggregate in-plan — per iteration one "
    "equi-join on a reused partitioning + one partial-agg shuffle; returns "
    "(node, rank) with ranks summing to 1",
    tags=("graph", "vector"),
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _knn_edges(spark, sf_dir)
    pr = G.pagerank(edges, damping=0.85, iterations=4, checkpoint_every=5)
    return pr.select("node", F.round("rank", 8).alias("rank"))


def _knn_edges_global(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-k kNN edges WITHOUT label blocking (for label propagation, where
    within-label edges would make the task degenerate). All-pairs scored —
    the exact tier; at 100 TB the candidate set comes from q_ann_ivf's cell
    routing instead, same ranking logic."""
    from ..functions import vectors as V

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(F.col("vec_id").alias("src"), F.col("embedding").alias("q_emb"))
    e = emb.select(F.col("vec_id").alias("dst"), F.col("embedding").alias("n_emb"))
    scored = (
        q.crossJoin(e)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", F.round(V.dot_seq(F.col("q_emb"), F.col("n_emb")), 6).alias("score"))
    )
    w = Window.partitionBy("src").orderBy(F.desc("score"), "dst")
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).select(
        "src", "dst"
    )


_LP_EDGES_SQL = """
    WITH scored AS (
      SELECT q.vec_id AS src, e.vec_id AS dst,
             ROUND(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                    CAST(e.embedding AS DOUBLE[])), 6) AS score
      FROM embeddings q JOIN embeddings e ON q.vec_id <> e.vec_id),
    knn AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src ORDER BY score DESC, dst) AS rk
        FROM scored) t
      WHERE rk <= 3),
    und AS (SELECT src, dst FROM knn UNION SELECT dst, src FROM knn)
"""

_LP_ROUND = """
    v{i} AS (
      SELECT und.dst AS node, s{p}.lab AS vote, COUNT(*) AS c
      FROM und JOIN s{p} ON und.src = s{p}.node
      WHERE s{p}.lab IS NOT NULL
      GROUP BY und.dst, s{p}.lab),
    b{i} AS (
      SELECT node, vote FROM (
        SELECT node, vote,
               ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, vote ASC) AS rn
        FROM v{i}) t
      WHERE rn = 1),
    s{i} AS (
      SELECT s{p}.node,
             CASE WHEN s{p}.node % 5 = 0 THEN s{p}.lab
                  ELSE COALESCE(b{i}.vote, s{p}.lab) END AS lab
      FROM s{p} LEFT JOIN b{i} ON s{p}.node = b{i}.node)
"""


@query(
    "q_label_propagation",
    # Fully oracle-checked BECAUSE the update is integer majority voting with
    # a deterministic (count desc, label asc) tie-break and a fixed round
    # count — the two synchronous rounds unroll as chained CTEs. Seeds: every
    # 5th vector keeps its true label, the rest start unlabeled and adopt
    # neighbor majorities over the global (unblocked) kNN graph.
    oracle=_LP_EDGES_SQL
    + """,
    s0 AS (
      SELECT vec_id AS node,
             CASE WHEN vec_id % 5 = 0 THEN label END AS lab
      FROM embeddings),
    """
    + _LP_ROUND.format(i=1, p=0)
    + ","
    + _LP_ROUND.format(i=2, p=1)
    + """
    SELECT node, CAST(lab AS BIGINT) AS label FROM s2
    """,
    description="semi-supervised label propagation (2 synchronous majority-vote "
    "rounds, 20% seed labels) over the global kNN embedding graph: per round one "
    "equi-join + one grouped vote count + one per-node argmax window — integer "
    "votes and deterministic tie-breaks make the whole iteration "
    "oracle-checkable, the property float-weighted variants lose",
    tags=("graph", "vector"),
)
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    edges = _knn_edges_global(spark, sf_dir)
    und = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    seeds = emb.select(
        F.col("vec_id").alias("node"),
        F.when(F.col("vec_id") % 5 == 0, F.col("label")).alias("label"),
        (F.col("vec_id") % 5 == 0).alias("fixed"),
    )
    out = G.label_propagation(und, seeds, iterations=2)
    return out.select("node", F.col("label").cast("bigint").alias("label"))


_UND_SQL = _EDGE_SQL + """,
    und AS (
      SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM edges GROUP BY a, b)
"""


@query(
    "q_graph_triangles",
    # Canonical-form triangle counting: undirected edges as (a<b) pairs, then
    # the a<b<c three-way self-join counts each triangle exactly once. The
    # global clustering coefficient 3·Δ/wedges comes from the same undirected
    # degree table (wedges = Σ d(d−1)/2) — all integer arithmetic until the
    # one final ratio. Two self-joins on the edge key: the standard
    # distributed triangle plan; at scale the join input is pre-filtered by
    # degree (high-degree hubs dominate cost — the known optimization, not
    # needed at this density).
    oracle=_UND_SQL
    + """,
    tri AS (
      SELECT COUNT(*) AS n_tri
      FROM und e1 JOIN und e2 ON e1.b = e2.a JOIN und e3
        ON e3.a = e1.a AND e3.b = e2.b),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT a AS node FROM und UNION ALL SELECT b FROM und) t
      GROUP BY node),
    wed AS (SELECT SUM(d * (d - 1) / 2) AS n_wedges, COUNT(*) AS n_nodes FROM deg)
    SELECT CAST(tri.n_tri AS BIGINT) AS n_triangles,
           (SELECT COUNT(*) FROM und) AS n_edges,
           CAST(wed.n_nodes AS BIGINT) AS n_nodes,
           ROUND(3.0 * tri.n_tri / wed.n_wedges, 6) AS clustering_coeff
    FROM tri CROSS JOIN wed
    """,
    description="triangle count + global clustering coefficient of the kNN "
    "similarity graph (the community-structure summary: high clustering = "
    "semantically coherent neighborhoods): canonical a<b<c three-way self-join "
    "counts each triangle once, wedges from the degree table — two equi-joins "
    "on edge keys, integer arithmetic to one final ratio",
    tags=("graph",),
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _knn_edges(spark, sf_dir)
    # Materialize the canonical edge list once: the three-way self-join plus
    # the degree branch consume it 5×, and each re-execution would replay
    # the kNN scoring join (measured 15 s → 3 s at sf0.01). localCheckpoint
    # also truncates the lineage, so the self-joins plan against a flat
    # |E|-row relation.
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wed = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("n_wedges"),
        F.count(F.lit(1)).alias("n_nodes"),
    )
    n_edges = und.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        tri.crossJoin(F.broadcast(wed))
        .crossJoin(F.broadcast(n_edges))
        .select(
            F.col("n_tri").cast("bigint").alias("n_triangles"),
            F.col("n_edges").cast("bigint").alias("n_edges"),
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            F.round(3.0 * F.col("n_tri") / F.col("n_wedges"), 6).alias("clustering_coeff"),
        )
    )


@query(
    "q_link_prediction",
    # Common-neighbors link prediction: for NON-adjacent pairs, how many
    # shared neighbors — the classic "you may also like" / missing-edge
    # score. Wedge join (und ⋈ und on the shared endpoint) generates
    # candidate pairs, an anti-join removes existing edges, top-20 by
    # (count desc, pair) is deterministic. Wedge-join cost is Σ d² — the
    # same degree-bounded budget as triangle counting.
    oracle=_UND_SQL
    + """,
    wedges AS (
      SELECT e1.a AS x, e1.b AS u, e2.b AS v FROM und e1 JOIN und e2
        ON e1.a = e2.a AND e1.b < e2.b
      UNION ALL
      SELECT e1.b AS x, e1.a AS u, e2.b AS v FROM und e1 JOIN und e2
        ON e1.b = e2.a
      UNION ALL
      SELECT e1.b AS x, e1.a AS u, e2.a AS v FROM und e1 JOIN und e2
        ON e1.b = e2.b AND e1.a < e2.a),
    cn AS (
      SELECT u, v, COUNT(*) AS common_neighbors
      FROM wedges GROUP BY u, v),
    nonadj AS (
      SELECT cn.u, cn.v, cn.common_neighbors
      FROM cn LEFT JOIN und ON cn.u = und.a AND cn.v = und.b
      WHERE und.a IS NULL)
    SELECT u, v, common_neighbors FROM nonadj
    ORDER BY common_neighbors DESC, u, v LIMIT 20
    """,
    description="common-neighbor link prediction over the kNN graph (the "
    "missing-edge / recommendation score): wedge self-join through each shared "
    "endpoint, anti-join strips existing edges, deterministic top-20 — candidate "
    "generation bounded by Σ degree², the same budget as triangle counting",
    tags=("graph",),
)
def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _knn_edges(spark, sf_dir)
    # Same materialize-once rationale as q_graph_triangles: three wedge joins
    # + the anti-join consume und; without it each replays the kNN scoring.
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e1, e2 = und.alias("e1"), und.alias("e2")
    w1 = e1.join(
        e2, (F.col("e1.a") == F.col("e2.a")) & (F.col("e1.b") < F.col("e2.b"))
    ).select(F.col("e1.b").alias("u"), F.col("e2.b").alias("v"))
    w2 = e1.join(e2, F.col("e1.b") == F.col("e2.a")).select(
        F.col("e1.a").alias("u"), F.col("e2.b").alias("v")
    )
    w3 = e1.join(
        e2, (F.col("e1.b") == F.col("e2.b")) & (F.col("e1.a") < F.col("e2.a"))
    ).select(F.col("e1.a").alias("u"), F.col("e2.a").alias("v"))
    cn = w1.unionAll(w2).unionAll(w3).groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("common_neighbors")
    )
    nonadj = cn.join(
        und, (cn["u"] == und["a"]) & (cn["v"] == und["b"]), "left_anti"
    )
    return nonadj.orderBy(F.desc("common_neighbors"), "u", "v").limit(20)
