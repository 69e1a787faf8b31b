"""Releasable localCheckpoint tracking for iterative operators.

``DataFrame.localCheckpoint(eager=True)`` is the right lineage-truncation
tool for convergence loops (without it the logical plan doubles per round
and Catalyst analysis dominates by ~round 10 — observed, operators/dedup.py)
— but its storage is NOT released by ``DataFrame.unpersist()``: the
checkpoint persists the internal RDD directly at the RDD level, outside the
CacheManager that ``unpersist()`` talks to.  In a long-lived session an
iterative operator that checkpoints per round therefore leaks one cached
RDD per round per invocation, unboundedly (VERDICT r05/r06).

The release path that DOES work (verified in-session): the superseded
checkpoint's RDD id, looked up in ``JavaSparkContext.getPersistentRDDs()``,
``unpersist()``-ed directly.  A released checkpoint is unrecoverable (its
lineage was truncated), so callers must release only generations nothing
references anymore — the previous round's labels after the next round has
materialized, never the frame being returned.

Driver-side single-threaded use only: the id diff in
``tracked_local_checkpoint`` assumes no concurrent persist activity on the
same SparkContext between the snapshot and the checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _persistent_ids(spark: SparkSession) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()  # type: ignore[union-attr]
    return {int(k) for k in jmap.keySet().toArray()}


def tracked_local_checkpoint(df: DataFrame) -> tuple[DataFrame, set[int]]:
    """Eager localCheckpoint + the RDD id(s) it pinned, for later release."""
    spark = df.sparkSession
    before = _persistent_ids(spark)
    out = df.localCheckpoint(eager=True)
    return out, _persistent_ids(spark) - before


def release_rdd_ids(spark: SparkSession, ids: set[int]) -> None:
    """Unpersist checkpoint RDDs by id (no-op for ids already gone).

    Non-blocking: the block removal completes asynchronously on the
    executors; the driver-side map entry is gone immediately.
    """
    if not ids:
        return
    jmap = spark.sparkContext._jsc.getPersistentRDDs()  # type: ignore[union-attr]
    for rid in ids:
        jrdd = jmap.get(int(rid))
        if jrdd is not None:
            jrdd.unpersist(False)
