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

    The argmin is ``min(struct(d, cid))`` over NARROW (id, d, cid) rows,
    with ``v`` joined back by id afterward — the struct deliberately does
    NOT carry the vector. A struct ``min`` is not hash-aggregable, so
    Catalyst plans SortAggregate either way; what the width decides is
    WHAT gets sorted. The previous form, ``min(struct(d, cid, v))``,
    sorted the full n·k scored stream with every row carrying the
    64-dim vector: at sf30's 600 k × 775 cells that is ~465 M rows ×
    ~550 B ≈ 250 GB of sort spill — measured filling the disk (the r13
    scale crash). The narrow form sorts ~26-byte rows (~12 GB at the
    same point, 20× less), partial_min still combines map-side so only
    n best-rows reach the shuffle, and the v join-back is one n-row
    equi-join against the input — three orders of magnitude smaller
    than the sort it replaces. (A row_number window would be strictly
    worse: full shuffle of all n·k rows, no partial aggregation.)
    Ties are impossible in the (d, cid) order because cid is unique per
    id, so the argmin is total and the value is bit-identical to the
    wide form (asserted by every kmeans-chain oracle parity).

    PRECONDITION (ADVICE r13): ``id_col`` must be unique and non-null —
    the join-back is an inner equi-join on it, so null ids are DROPPED
    and duplicate ids FAN OUT (the old groupBy form kept both; every
    in-repo caller feeds the unique non-null ``vec_id``). The join-back
    also evaluates the ``vecs`` lineage a second time (once under
    ``scored``, once as the join probe): fine when vecs is a table scan
    as in all current callers, but a caller whose vecs is an expensive
    unpersisted subtree should persist it first (kmeans_fit's callers
    already tracked_persist the fit output for the same reason)."""
    # fan_out (r16, guide §2.5 input skew): the n·k scoring stream inherits
    # the vector scan's partitioning, and a tiny single-file corpus scans as
    # ONE task — the whole decimal scoring fold (n·k·dim interpreted ops)
    # ran single-threaded, measured as ~60% of the scaled-ANN build wall at
    # sf0.1. Metadata-driven: no-op for multi-file/big/non-file inputs, and
    # the two assign rounds' identical exchanges dedupe via ReusedExchange.
    from ..layout import fan_out

    vecs = fan_out(vecs, id_col)
    # NOT the static unroll (r16 negative result, guide §1.1): swapping the
    # HOF fold for V.sqdist_static(..., dim=64) here measured 2× SLOWER
    # per-row on the warm assign stages (0.44→0.89 s assign1) — the 64-term
    # decimal chain with per-step casts defeats codegen (method-size
    # fallback) while doubling the (a[i]-b[i]) subexpressions; the
    # interpreted zip_with fold wins. Same verdict as r15's per-query
    # unrolled ADC trees.
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        id_col, V.sqdist(F.col("v"), F.col("c")).alias("d"), "cid"
    )
    best = scored.groupBy(id_col).agg(F.min(F.struct("d", "cid")).alias("m"))
    return vecs.join(best, id_col).select(id_col, "v", F.col("m.cid").alias("cid"))


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
