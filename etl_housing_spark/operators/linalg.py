"""Distributed dense linear algebra over embedding columns.

The portable queries (q_corr_matrix, q_pca_power_portable) compute their
sufficient statistics with exploded pair products and DECIMAL(38,12) sums —
bit-reproducible against the DuckDB oracle, but paying both the 2016×
row blow-up and the decimal tax. This module is the PRODUCTION path: the
classic per-partition Gram reduction (MLlib RowMatrix.computeGramianMatrix's
shape, re-expressed Arrow-side) — each Arrow batch contributes
``X^T X`` / ``ΣX`` / ``n`` via one vectorized numpy matmul, the shuffle
carries d(d+1)/2 + d + 1 partial rows per partition, and a final grouped
sum closes. Float64 accumulation order then depends on partitioning, so
results are reproducible to ~1e-12 relative — not bit-stable. That is the
declared trade (exactly the murmur3-vs-md5 and EHS_FAST_SUMS pattern):
the portable twin is the verification surface, this is what a deployment
runs. Equivalence within tolerance is pinned by tests/test_operators.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRAM_SCHEMA = "i INT, j INT, v DOUBLE"


def gram_moments(df: DataFrame, col: str = "embedding", dim: int = 64) -> DataFrame:
    """Partial-Gram sufficient statistics: rows (i, j, Σ x_i·x_j) for the
    upper triangle i <= j (1-based), plus (i, 0, Σ x_i) marginal sums and
    (0, 0, n). One numpy matmul per Arrow batch — no per-pair explode."""

    def gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        iu = np.triu_indices(dim)
        # accumulate across the WHOLE partition and emit once — per-batch
        # partials would grow the shuffle linearly with corpus size (10k-row
        # Arrow batches -> 100 frames per 1M-row partition) and break the
        # d(d+1)/2-rows-per-partition contract this operator exists for
        g = np.zeros((dim, dim))
        s = np.zeros(dim)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[col].to_numpy()).astype(np.float64)
            g += x.T @ x
            s += x.sum(axis=0)
            n += len(x)
        if n == 0:
            return
        rows_i = np.concatenate([iu[0] + 1, np.arange(1, dim + 1), [0]])
        rows_j = np.concatenate([iu[1] + 1, np.zeros(dim, dtype=int), [0]])
        vals = np.concatenate([g[iu], s, [float(n)]])
        yield pd.DataFrame({"i": rows_i, "j": rows_j, "v": vals})

    partials = df.select(col).mapInPandas(gram, GRAM_SCHEMA)
    return partials.groupBy("i", "j").agg(F.sum("v").alias("v"))


def corr_from_gram(moments: DataFrame) -> DataFrame:
    """Pearson r for every dimension pair from :func:`gram_moments` output
    — same closing formula as the portable q_corr_matrix."""
    n = moments.filter((F.col("i") == 0) & (F.col("j") == 0)).select(
        F.col("v").alias("n")
    )
    sx = moments.filter((F.col("i") > 0) & (F.col("j") == 0)).select(
        "i", F.col("v").alias("sx")
    )
    prod = moments.filter((F.col("j") > 0) & (F.col("i") < F.col("j"))).select(
        "i", "j", F.col("v").alias("sxy")
    )
    sxx = moments.filter((F.col("j") > 0) & (F.col("i") == F.col("j"))).select(
        "i", F.col("v").alias("sxx")
    )
    ma = sx.join(sxx, "i").select(
        "i", F.col("sx").alias("sx_a"), F.col("sxx").alias("sxx_a")
    )
    mb = sx.join(sxx, "i").select(
        F.col("i").alias("j"), F.col("sx").alias("sx_b"), F.col("sxx").alias("sxx_b")
    )
    joined = (
        prod.join(F.broadcast(ma), "i")
        .join(F.broadcast(mb), "j")
        .crossJoin(F.broadcast(n))
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx_a") * F.col("sx_b")) / F.sqrt(
        (F.col("n") * F.col("sxx_a") - F.col("sx_a") * F.col("sx_a"))
        * (F.col("n") * F.col("sxx_b") - F.col("sx_b") * F.col("sx_b"))
    )
    return joined.select(
        F.col("i").cast("bigint").alias("i"),
        F.col("j").cast("bigint").alias("j"),
        F.round(corr, 6).alias("corr"),
    )


def cov_from_gram(moments: DataFrame) -> DataFrame:
    """Full symmetric covariance matrix (i, j, aij) from
    :func:`gram_moments` output — the power-iteration input."""
    n = moments.filter((F.col("i") == 0) & (F.col("j") == 0)).select(
        F.col("v").alias("n")
    )
    sx = moments.filter((F.col("i") > 0) & (F.col("j") == 0)).select(
        "i", F.col("v").alias("sx")
    )
    upper = moments.filter((F.col("j") > 0) & (F.col("i") <= F.col("j"))).select(
        "i", "j", F.col("v").alias("sxy")
    )
    ma = sx.select("i", F.col("sx").alias("sx_a"))
    mb = sx.select(F.col("i").alias("j"), F.col("sx").alias("sx_b"))
    joined = (
        upper.join(F.broadcast(ma), "i")
        .join(F.broadcast(mb), "j")
        .crossJoin(F.broadcast(n))
    )
    aij = (F.col("n") * F.col("sxy") - F.col("sx_a") * F.col("sx_b")) / (
        F.col("n") * F.col("n")
    )
    half = joined.select("i", "j", aij.alias("aij"))
    mirrored = half.filter(F.col("i") < F.col("j")).select(
        F.col("j").alias("i"), F.col("i").alias("j"), "aij"
    )
    return half.unionByName(mirrored)


def pca_power_from_gram(moments: DataFrame, dim: int = 64, iters: int = 2):
    """(v, nrm) after ``iters`` power steps over :func:`cov_from_gram` —
    the production twin of the portable power iteration (plain double
    sums; rows-only by contract)."""
    a = cov_from_gram(moments)
    spark = moments.sparkSession
    v = spark.range(1, dim + 1).select(
        F.col("id").cast("int").alias("i"), F.lit(1.0 / (dim ** 0.5)).alias("v")
    )
    nrm = None
    for _ in range(iters):
        w = (
            a.join(v.select(F.col("i").alias("j"), "v"), "j")
            .groupBy("i")
            .agg(F.sum(F.col("aij") * F.col("v")).alias("wv"))
        )
        nrm = w.agg(F.sqrt(F.sum(F.col("wv") * F.col("wv"))).alias("nrm"))
        v = w.crossJoin(F.broadcast(nrm)).select(
            "i", (F.col("wv") / F.col("nrm")).alias("v")
        )
    return v, nrm
