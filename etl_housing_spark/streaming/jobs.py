"""Streaming jobs over the events table (SURVEY.md §2.11).

State is bounded by design: windowed aggregations + watermarks, and
watermarked dropDuplicates — no arbitrary mapGroupsWithState (nothing in the
reference motivates it). At scale the watermark bounds state linearly in
(windows within horizon × groups), and availableNow gives incremental batch
with exactly-once file tracking — the correct re-expression of "cron job +
re-read the folder".
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_runtime_confs

EVENTS_SCHEMA = (
    "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (ts arrives as int64 ns
    under the nanos flag, normalized exactly like the batch loader)."""
    ensure_runtime_confs(spark)
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # LTZ (not NTZ): EventTimeWatermark requires TIMESTAMP type; the session
    # is pinned to UTC so wall-times match the batch loader's NTZ values
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts per event_type — the streaming twin
    of q_window_tumbling; late rows beyond the watermark are dropped and
    per-window state is retired once the watermark passes."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def dedup_events(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Cross-batch dedup on event_id with bounded state (the apt_id dedup
    TODO, 0-ToDo.md:54, solved with a watermark horizon)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def run_available_now(result: DataFrame, name: str | None = None) -> DataFrame:
    """Execute a streaming plan with trigger(availableNow) into a memory sink
    and return the materialized result as a batch DataFrame."""
    name = name or f"ehs_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix=f"ehs_ckpt_{name}_")
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if result.isStreaming and _has_agg(result) else "append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return result.sparkSession.table(name)


def _has_agg(df: DataFrame) -> bool:
    try:
        return "Aggregate" in df._jdf.queryExecution().analyzed().toString()  # type: ignore[union-attr]
    except Exception:
        return True


def enrich_with_dim(events: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: each micro-batch joins the (small, broadcast)
    static dimension — no streaming state at all, the planner re-reads the
    dim per batch. The enrichment shape every event pipeline needs."""
    return events.join(F.broadcast(dim), on, "left")


def upsert_each_batch(result: DataFrame, warehouse, table: str, key_cols: list[str],
                      checkpoint: str) -> None:
    """Incremental materialization: every micro-batch MERGEs into a
    warehouse table via foreachBatch — re-running the stream over the same
    files is idempotent (the correct form of the reference's duplicate-
    appending to_sql(if_exists='append'), load_save_sql.ipynb:228).
    """
    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        warehouse.upsert(batch_df, table, key_cols)

    q = (
        result.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
