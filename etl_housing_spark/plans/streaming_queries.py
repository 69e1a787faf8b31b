"""Streaming queries (SURVEY.md §2.11) — real readStream plans executed with
trigger(availableNow) and returned as batch DataFrames.

Both are ⊘ rows-only for the driver (watermark semantics aren't
DuckDB-expressible); the strong check is tests/test_streaming_equiv.py's
batch⇄stream equivalence assertion against the oracle-checked batch twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming import jobs
from .registry import query


@query(
    "q_stream_tumbling",
    oracle=None,  # ⊘ streaming semantics; equivalence-tested vs q_window_tumbling
    description="streaming tumbling-window counts via readStream + availableNow + "
    "watermark (incremental re-expression of the daily cron batch)",
    tags=("streaming",),
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = jobs.read_events_stream(spark, sf_dir)
    return jobs.run_available_now(jobs.tumbling_counts(events))


@query(
    "q_stream_dedup",
    oracle=None,  # ⊘ streaming semantics; count-equivalence-tested vs batch distinct
    description="watermarked cross-batch dedup on event_id (the apt_id TODO solved)",
    tags=("streaming",),
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = jobs.read_events_stream(spark, sf_dir)
    return jobs.run_available_now(jobs.dedup_events(events)).select(
        "event_id", "event_type", "value"
    )


@query(
    "q_stream_sessionize",
    oracle=None,  # ⊘ custom stateful streaming; closed-session equivalence-tested vs q_sessionize
    description="streaming gap-based sessionization via applyInPandasWithState — "
    "custom stateful operator, O(active users) fixed-size state, emits a session "
    "the moment a later event closes it; batch twin is q_sessionize",
    tags=("streaming", "timeseries"),
)
def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = jobs.read_events_stream(spark, sf_dir)
    return jobs.run_available_now(jobs.sessionize_stream(events, gap="12 hours"))
