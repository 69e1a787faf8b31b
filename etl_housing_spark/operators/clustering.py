"""Distributed k-means over ``array`` embedding columns (SURVEY §2.13 /
§2.10 extension; the reference has no clustering surface).

The fit is the textbook distributed Lloyd step, driver-unrolled like
MLlib's KMeans: assignment BROADCASTs the k tiny centroids against the
vector scan (no shuffle on the big side), the update is one (cid, dim)
partial-agg shuffle. Every cross-engine decision point is exact so the fit
is value-verifiable against a SQL oracle (q_kmeans_portable): squared
distances accumulate per-dim double products in DECIMAL(28,18)
(functions.vectors.sqdist — associative, so the in-row fold equals a
grouped decimal SUM bit-for-bit), assignment is argmin under a total
(dist, cid) order, and centroid means are decimal-exact sums divided once
in double.

Downstream use: the learned assignment IS an IVF coarse quantizer —
``q_ann_ivf_kmeans`` probes the trained cells instead of the testdata's
pre-assigned label column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V

_ACC = "decimal(28,18)"  # same lossless accumulator as functions.vectors

__all__ = ["seed_centroids", "kmeans_assign", "kmeans_update", "kmeans_fit"]


def seed_centroids(vecs: DataFrame, k: int, id_col: str = "vec_id") -> DataFrame:
    """Deterministic seeding: the k lowest-id vectors' embeddings →
    (cid, c). No rand(); retried jobs and both oracle engines agree."""
    return (
        vecs.orderBy(id_col)
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy(id_col)) - 1).alias("cid"),
            F.col("v").alias("c"),
        )
    )


def kmeans_assign(vecs: DataFrame, cents: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """(id, v) × broadcast centroids → (id, v, cid) by decimal-exact argmin
    under the total (dist, cid) order.

    r16 form (guide §2.4 "remove shuffles outright"): the argmin is
    ``array_min`` over an IN-ROW array of (d, cid) structs — the centroid
    set arrives as ONE broadcast single-row array (a lazy
    ``collect_list(struct(cid, c))`` aggregate, kc·dim doubles ≈ 400 KB
    at sf30's kc=775, ~16 MB at kc≈32k/n=10⁹), and each vector row folds
    over it locally. ``array_min`` on structs uses the same lexicographic
    (d, cid) ordering as the previous ``min(struct(d, cid))``
    SortAggregate and ``collect_list``'s row order cannot matter under a
    total min, so the assignment is bit-identical (asserted by every
    kmeans-chain oracle parity) — but the n·k scored stream, its
    SortAggregate, the best-row shuffle AND the v join-back (which
    re-evaluated the vecs lineage) are all gone: the whole operator is
    one shuffle-free projection over the (fanned-out) scan. History: the
    r13 form ``min(struct(d, cid, v))`` sort-spilled ~250 GB at sf30;
    the r15 narrow-struct form fixed the spill but still paid two
    exchanges and a double scan per assign round. The in-row fold has no
    sort, no shuffle, and touches each input row once.

    PRECONDITION (ADVICE r13): ``id_col`` must be unique and non-null —
    callers' downstream equi-joins on it assume so (every in-repo caller
    feeds the unique non-null ``vec_id``)."""
    # fan_out (r16, guide §2.5 input skew): the per-row k·dim decimal fold
    # inherits the vector scan's partitioning, and a tiny single-file
    # corpus scans as ONE task — the whole scoring stream ran
    # single-threaded, measured as ~60% of the scaled-ANN build wall at
    # sf0.1. Metadata-driven: no-op for multi-file/big/non-file inputs.
    from ..layout import fan_out

    vecs = fan_out(vecs, id_col)
    # NOT the static unroll (r16 negative result, guide §1.1): swapping the
    # HOF fold for V.sqdist_static(..., dim=64) here measured 2× SLOWER
    # per-row on the warm assign stages (0.44→0.89 s assign1) — the 64-term
    # decimal chain with per-step casts defeats codegen (method-size
    # fallback) while doubling the (a[i]-b[i]) subexpressions; the
    # interpreted zip_with fold wins. Same verdict as r15's per-query
    # unrolled ADC trees.
    carr = cents.agg(F.collect_list(F.struct("cid", "c")).alias("cs"))
    best = F.array_min(
        F.transform(
            F.col("cs"),
            lambda s: F.struct(
                V.sqdist(F.col("v"), s["c"]).alias("d"), s["cid"].alias("cid")
            ),
        )
    )["cid"]
    return vecs.crossJoin(F.broadcast(carr)).select(id_col, "v", best.alias("cid"))


def kmeans_update(assigned: DataFrame) -> DataFrame:
    """Assigned vectors → new (cid, c) centroids: decimal-exact per-dim
    sums, one double division, dims reassembled in index order."""
    pe = assigned.select("cid", F.posexplode("v").alias("dim", "val"))
    per_dim = pe.groupBy("cid", "dim").agg(
        (F.sum(F.col("val").cast(_ACC)).cast("double") / F.count(F.lit(1))).alias("m")
    )
    return per_dim.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
        ).alias("c")
    )


def kmeans_fit(
    vecs: DataFrame, k: int = 4, rounds: int = 2, id_col: str = "vec_id"
) -> tuple[DataFrame, DataFrame]:
    """``rounds`` unrolled Lloyd iterations → (final assignment, final
    centroids). ``vecs`` must be (id, v: array<double>). The final
    centroids are the update over the final assignment — the pair a
    downstream IVF index stores."""
    cents = seed_centroids(vecs, k, id_col)
    assigned = kmeans_assign(vecs, cents, id_col)
    for _ in range(rounds - 1):
        cents = kmeans_update(assigned)
        assigned = kmeans_assign(vecs, cents, id_col)
    return assigned, kmeans_update(assigned)
