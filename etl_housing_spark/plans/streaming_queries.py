"""Streaming queries (SURVEY.md §2.11) — real readStream plans executed with
trigger(availableNow) and returned as batch DataFrames.

All but one are ⊘ rows-only for the driver (watermark/state semantics aren't
DuckDB-expressible); the strong check is tests/test_streaming_equiv.py's
batch⇄stream equivalence assertion against the oracle-checked batch twins.
The exception is q_stream_enrich — a stateless row-deterministic stream-static
join — which carries the full hash-checked oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


@query(
    "q_stream_anomaly",
    oracle=None,  # ⊘ custom stateful streaming; prefix-stat scoring
    # equivalence-tested against the batch formula in
    # tests/test_streaming_equiv.py::test_anomaly_stream_scores_against_prefix_stats
    description="streaming z-score anomaly scoring via applyInPandasWithState — "
    "O(event types) fixed-size state (count, Σv, Σv²), each micro-batch scored "
    "against the stats of all PREVIOUS batches (causally honest alerting); "
    "batch twin is q_anomaly_zscore",
    tags=("streaming", "timeseries"),
)
def q_stream_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Replay events as two micro-batches (split on event_id parity, mtimes
    # pinned so the file source orders them) — a single-batch availableNow
    # run would score everything against an empty prefix and emit nothing;
    # this entry demonstrates the cross-batch state the operator exists for.
    import os
    import tempfile

    from ..catalog import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    d = tempfile.mkdtemp(prefix="ehs_anom_replay_")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{d}/p1")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{d}/p2")
    now = 1_700_000_000
    for sub, t in (("p1", now - 1000), ("p2", now)):
        for f in os.listdir(f"{d}/{sub}"):
            os.utime(f"{d}/{sub}/{f}", (t, t))
    stream = (
        spark.readStream.schema("event_id BIGINT, event_type STRING, value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/*")
    )
    return jobs.run_available_now(jobs.anomaly_stream(stream))


@query(
    "q_stream_enrich",
    # The one streaming shape whose output IS batch-deterministic (row-level
    # left join to a static snapshot, no watermark, no state), so unlike the
    # rest of the streaming family it gets the full hash check: the oracle
    # is the identical dimension expressed as a CASE over the same rows.
    oracle="""
    SELECT event_id, event_type,
           CASE WHEN event_type IN ('purchase', 'signup') THEN 'conversion'
                WHEN event_type = 'error' THEN 'ops'
                WHEN event_type IN ('click', 'view') THEN 'engagement'
                ELSE NULL END AS tier,
           value
    FROM events
    """,
    description="stream-static enrichment join: each micro-batch broadcast-joins "
    "the static tier dimension onto the event stream (no streaming state at all "
    "— the planner re-reads the dim per batch); the enrichment shape every event "
    "pipeline runs, and the one streaming query that is row-deterministic, so it "
    "is fully hash-checked against the batch oracle",
    tags=("streaming", "join"),
)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = spark.createDataFrame(
        [
            ("purchase", "conversion"),
            ("signup", "conversion"),
            ("error", "ops"),
            ("click", "engagement"),
            ("view", "engagement"),
        ],
        "event_type string, tier string",
    )
    events = jobs.read_events_stream(spark, sf_dir)
    enriched = jobs.enrich_with_dim(events, dim, "event_type")
    return jobs.run_available_now(
        enriched.select("event_id", "event_type", "tier", "value")
    )


@query(
    "q_stream_join",
    oracle=None,  # ⊘ streaming semantics; equivalence-tested vs the batch interval join
    description="stream-stream watermarked interval join (click ← same-user views "
    "in the prior hour, the attribution lookback): both sides watermarked and the "
    "event-time bound in the join condition lets Spark retire per-side state at "
    "the rate × horizon bound instead of buffering stream history; batch twin "
    "equivalence in tests/test_streaming_equiv.py",
    tags=("streaming", "join"),
)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = jobs.read_events_stream(spark, sf_dir)
    clicks = events.filter(F.col("event_type") == "click")
    views = events.filter(F.col("event_type") == "view")
    return jobs.run_available_now(jobs.interval_join_streams(clicks, views))
