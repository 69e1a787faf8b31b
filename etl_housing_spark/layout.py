"""Physical-input layout helpers shared by plans/ and operators/.

Fan-out of tiny under-parallel scans (r16, optimization guide §2.5 "input
skew" / §6 small files): a table small enough to land in ONE parquet file
scans as ONE task, so a query whose cost is a per-row EXPLOSION of that
table (q_corr_matrix's 2016-way in-row pair products into a decimal agg, a
shingle×16-hash MinHash pass, a media decode) runs its generate +
partial-aggregate stage on one core while the rest of the session idles —
measured as q_corr_matrix's whole 8.4 s cold wall at sf0.1 (r16 idle
baseline; 2.3 s after). The fix only applies when the scan is PROVABLY tiny
(total input bytes known driver-side and below the bound), so the exchange
it adds is trivially cheap by construction; at production scale the same
table arrives as many files/row groups and fan_out returns the frame
unchanged, adding zero exchanges — the decision is metadata-driven, never
tuned to a core count.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FAN_OUT_MAX_BYTES = 32 * 1024 * 1024


def fan_out(df: DataFrame, key: str | None = None) -> DataFrame:
    """Hash/round-robin repartition a tiny single(-few)-file scan to session
    parallelism before per-row-heavy work; no-op for big or already-parallel
    inputs and for non-file sources.

    ``key``: optional high-cardinality column (a unique id) — hash
    repartitioning on it gives a deterministic row→partition mapping with no
    pre-sort; without it the round-robin form is used (deterministic here
    too: the input is a deterministic scan and Spark sorts before round-robin
    by default, SPARK-23207). Values of every downstream query are unchanged
    either way — consumers are order-free by the engine's decimal-sum
    discipline or explicitly ordered.
    """
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files:
        return df
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    if len(files) >= par:
        return df
    total = 0
    for f in files:
        p = f[len("file:"):] if f.startswith("file:") else f
        if not os.path.isfile(p):
            return df  # remote storage — size unknown, leave untouched
        total += os.path.getsize(p)
    if total > FAN_OUT_MAX_BYTES:
        return df
    if key is not None:
        return df.repartition(par, F.col(key))
    return df.repartition(par)


def source_bytes(df: DataFrame) -> int | None:
    """Total on-disk bytes of ``df``'s file-source scans, or None when any
    leaf is non-file / remote / size-unknown. Driver-side metadata only —
    no job runs."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for f in files:
        p = f[len("file:"):] if f.startswith("file:") else f
        if not os.path.isfile(p):
            return None
        total += os.path.getsize(p)
    return total


def broadcast_if_tiny(df: DataFrame, probe: DataFrame | None = None) -> DataFrame:
    """``F.broadcast(df)`` when the underlying scan (``probe``'s, default
    ``df``'s own) is PROVABLY tiny (``source_bytes`` ≤ FAN_OUT_MAX_BYTES),
    else ``df`` unchanged.

    The companion of :func:`fan_out` for the attach-side of the
    skinny-pairs pattern (r16, guide §2.4/§3.1): a per-pair-heavy stage
    keeps its candidate frame skinny and explicitly repartitioned, and the
    row payload (vectors, norms) re-attaches by unique id afterwards — as
    a broadcast hash join when the corpus is provably broadcast-sized (the
    stream side keeps its explicit partitioning, so the heavy projection
    stays fanned out), and as a plain shuffle equi-join otherwise
    (production: unskewed by construction on a unique id). Metadata-driven
    like fan_out — never tuned to a core count."""
    src = source_bytes(probe if probe is not None else df)
    if src is not None and src <= FAN_OUT_MAX_BYTES:
        return F.broadcast(df)
    return df
