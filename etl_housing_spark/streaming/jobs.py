"""Streaming jobs over the events table (SURVEY.md §2.11).

State is bounded by design: windowed aggregations + watermarks, watermarked
dropDuplicates, and one custom stateful operator (sessionize_stream, built
on applyInPandasWithState) whose state is a single fixed-size record per
active entity. At scale the watermark bounds window state linearly in
(windows within horizon × groups), dedup state in (ids within horizon),
and session state in (active users) — nothing unbounded. availableNow gives
incremental batch with exactly-once file tracking — the correct
re-expression of "cron job + re-read the folder".
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_runtime_confs

def _events_schema(ts_sql_type: str) -> str:
    return (
        f"event_id BIGINT, ts {ts_sql_type}, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING"
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet, normalized exactly like the
    batch loader (catalog.load_table): the testdata generator has shipped ts
    as both TIMESTAMP(NANOS) (readable only as int64 ns under the nanos flag)
    and TIMESTAMP(MICROS); a one-time footer read of the batch schema picks
    the branch, so the stream's event-time column always matches batch."""
    ensure_runtime_confs(spark)
    ts_type = dict(spark.read.parquet(f"{sf_dir}/events.parquet").dtypes)["ts"]
    reader = spark.readStream.option("pathGlobFilter", "events.parquet")
    # LTZ (not NTZ): EventTimeWatermark requires TIMESTAMP type; the session
    # is pinned to UTC so wall-times match the batch loader's NTZ values
    if ts_type == "bigint":
        raw = reader.schema(_events_schema("BIGINT")).parquet(sf_dir)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return reader.schema(_events_schema("TIMESTAMP")).parquet(sf_dir)


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


def _no_data_batch_safe(result: DataFrame) -> bool:
    """True when a one-shot run's RESULTS provably cannot depend on the
    trailing watermark-advancing no-data micro-batch (r17, ADVICE r16 #2:
    the r16 form disabled it for EVERY availableNow run — result-safe for
    the current catalog, but a future append-mode operator that emits on
    watermark advance would silently lose its final-flush rows).

    Safe by construction:
    - aggregates: the runners execute them in COMPLETE mode, which re-emits
      the full state on every data batch — the empty batch adds nothing;
    - stateless maps / stream-static enrichments and INNER stream-stream
      joins: rows emit on arrival;
    - applyInPandasWithState with NoTimeout: emission happens only when a
      later event arrives, never on watermark/clock timeout.

    NOT safe (the final flush IS the output): event/processing-time
    timeouts in stateful operators, and OUTER stream-stream joins (the
    unmatched side emits when the watermark closes the window). For those
    this returns False and the callers keep noDataMicroBatches ENABLED —
    correct rows, one extra empty batch of cost. Detection is textual over
    the analyzed plan: conservative on the known-unsafe markers, and the
    law test (tests/test_streaming_equiv.py::test_no_data_batch_contract) pins
    both directions so a new unsafe operator cannot silently route through
    the fast path."""
    try:
        plan = result._jdf.queryExecution().analyzed().toString()  # type: ignore[union-attr]
    except Exception:
        return False  # unknown plan — keep the engine default
    if "EventTimeTimeout" in plan or "ProcessingTimeTimeout" in plan:
        return False
    outer = any(
        j in plan for j in ("LeftOuter", "RightOuter", "FullOuter")
    )
    if outer and plan.count("StreamingRelation") >= 2:
        return False  # stream-stream outer join: unmatched rows flush on watermark
    return True


class _no_data_batches_off:
    """Scoped disable of the trailing NO-DATA micro-batch for one-shot
    availableNow runs (r16, guide §1.1 measured): after the data batch,
    Structured Streaming schedules an empty batch purely to advance the
    watermark, and that batch RE-COMMITS every state store instance —
    measured 2.4 s of the stream-stream join's 8 s wall at sf0.1 (progress:
    batch 1, 0 input rows, addBatch 2.2 s). Since r17 the runners apply it
    only when :func:`_no_data_batch_safe` proves the plan's output cannot
    depend on the empty batch; continuous production streams keep the
    default (the conf is restored on exit). ``enabled=False`` makes the
    scope a no-op (the engine default stays in force)."""

    _KEY = "spark.sql.streaming.noDataMicroBatches.enabled"

    def __init__(self, spark: SparkSession, enabled: bool = True):
        self._spark = spark
        self._enabled = enabled

    def __enter__(self):
        if not self._enabled:
            return
        self._old = self._spark.conf.get(self._KEY, "true")
        self._spark.conf.set(self._KEY, "false")

    def __exit__(self, *exc):
        if self._enabled:
            self._spark.conf.set(self._KEY, self._old)


def run_available_now(result: DataFrame, name: str | None = None) -> DataFrame:
    """Execute a streaming plan with trigger(availableNow) into a memory sink
    and return the materialized result as a batch DataFrame."""
    name = name or f"ehs_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix=f"ehs_ckpt_{name}_")
    try:
        with _no_data_batches_off(
            result.sparkSession, enabled=_no_data_batch_safe(result)
        ):
            q = (
                result.writeStream.format("memory")
                .queryName(name)
                .outputMode(
                    "complete"
                    if result.isStreaming and _has_agg(result)
                    else "append"
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        # memory sink holds the materialized rows; the checkpoint dir is
        # dead weight once the availableNow run terminates
        shutil.rmtree(ckpt, ignore_errors=True)
    return result.sparkSession.table(name)


def _has_agg(df: DataFrame) -> bool:
    try:
        return "Aggregate" in df._jdf.queryExecution().analyzed().toString()  # type: ignore[union-attr]
    except Exception:
        return True


def interval_join_streams(
    clicks: DataFrame,
    views: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: each click matched to the same user's views
    in the preceding ``lookback`` (attribution's click←view lookback window).

    Both sides carry watermarks and the join condition bounds event-time
    distance, which is exactly what lets Spark RETIRE state: a buffered view
    can only match clicks within lookback+watermark, so per-side state is
    bounded by the event rate × horizon — never the stream's history. An
    unconstrained stream-stream join would buffer forever; this is the
    canonical bounded form (Structured Streaming guide, stream-stream joins).

    At 100 TB/day both sides shuffle on user_id (co-partitioned by the join
    key); skewed users are the q_join_salted situation and salt identically.
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    cond = (
        (c.c_user == v.v_user)
        & (v.view_ts <= c.click_ts)
        & (v.view_ts >= c.click_ts - F.expr(f"INTERVAL {lookback}"))
    )
    return c.join(v, cond).select(
        F.col("c_user").alias("user_id"), "click_id", "click_ts", "view_id", "view_ts"
    )


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

    with _no_data_batches_off(
        result.sparkSession, enabled=_no_data_batch_safe(result)
    ):
        q = (
            result.writeStream.foreachBatch(_merge)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


SESSION_OUT_SCHEMA = (
    "user_id BIGINT, session_seq BIGINT, n_events BIGINT, "
    "session_start TIMESTAMP, session_end TIMESTAMP"
)
_SESSION_STATE_SCHEMA = "last_us BIGINT, seq BIGINT, start_us BIGINT, n BIGINT"


def sessionize_stream(events: DataFrame, gap: str = "12 hours") -> DataFrame:
    """Streaming gap-based sessionization — the applyInPandasWithState twin
    of plans.timeseries_queries.q_sessionize.

    Custom stateful operator (the one place the catalog needs more than
    windowed aggs): state is one fixed-size record per *active* user
    (last event time, open-session seq/start/count), so state size is
    O(active entities), not O(events) — bounded by construction. Each
    micro-batch's rows are sorted by event time inside the Arrow batch;
    a session is emitted the moment a later event closes it (gap
    exceeded). The open session per user stays in state and is not
    emitted — batch⇄stream equivalence modulo exactly that tail is
    asserted in tests/test_streaming_equiv.py. Cross-batch late events
    (older than the state's last seen time) extend the open session
    conservatively rather than resurrecting a closed one — same horizon
    contract as the watermarked operators above.
    """
    import pandas as pd  # Arrow batches arrive as pandas frames

    gap_us = int(pd.Timedelta(gap).total_seconds() * 1_000_000)

    def fn(key, pdfs, state):
        (user_id,) = key
        parts = [pdf for pdf in pdfs]
        rows = pd.concat(parts) if parts else pd.DataFrame({"ts": []})
        # normalize to int64 µs regardless of the Arrow batch's datetime64 unit
        ts_us = sorted(
            pd.to_datetime(rows["ts"]).astype("datetime64[us]").astype("int64")
        )
        if state.exists:
            last_us, seq, start_us, n = state.get
        else:
            last_us, seq, start_us, n = None, 0, None, 0
        closed: list[tuple[int, int, int, int]] = []
        for t in ts_us:
            if last_us is None or t - last_us > gap_us:
                if n > 0:
                    closed.append((seq, n, start_us, last_us))
                seq, start_us, n = seq + 1, t, 0
            n += 1
            last_us = max(last_us, t) if last_us is not None else t
        state.update((last_us, seq, start_us, n))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_seq": [c[0] for c in closed],
                    "n_events": [c[1] for c in closed],
                    "session_start": pd.to_datetime([c[2] for c in closed], unit="us"),
                    "session_end": pd.to_datetime([c[3] for c in closed], unit="us"),
                }
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ANOMALY_OUT_SCHEMA = "event_id BIGINT, event_type STRING, value DOUBLE, z DOUBLE"
_ANOMALY_STATE_SCHEMA = "n BIGINT, s DOUBLE, s2 DOUBLE"


def anomaly_stream(events: DataFrame, threshold: float = 3.0) -> DataFrame:
    """Streaming z-score anomaly scorer — the stateful twin of
    plans.pipeline_queries.q_anomaly_zscore.

    State per event_type is three numbers (count, Σv, Σv²); each
    micro-batch is scored against the stats accumulated from *previous*
    batches (prefix semantics — deterministic given the batch sequence,
    and causally honest: an alert never uses information that arrived
    after the event), then folded into the state. State size is
    O(event types) — fixed, not data-bounded. Until a type has seen ≥ 2
    events and a positive variance, nothing is emitted for it.

    Determinism (round 4, what promoted this operator to hash-checked):
    each micro-batch's Σv and Σv² are accumulated in 6-dp-quantized
    DECIMAL (the catalog's dsum recipe) and converted to double once —
    correctly rounded, order-free — so the per-batch state record, and
    therefore every score, is the identical double regardless of
    partition/arrival order and matches the SQL twin
    CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) bit for bit. Cross-batch
    accumulation adds those per-batch doubles in batch order (the batch
    sequence is the stream's defined order). State stays three numbers.
    """
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    q6 = Decimal("0.000001")

    def fn(key, pdfs, state):
        (event_type,) = key
        parts = [pdf for pdf in pdfs]
        rows = pd.concat(parts) if parts else pd.DataFrame({"event_id": [], "value": []})
        n, s, s2 = state.get if state.exists else (0, 0.0, 0.0)
        if n >= 2:
            mu = s / n
            var = s2 / n - mu * mu
            if var > 0:
                sigma = math.sqrt(var)
                z = (rows["value"] - mu) / sigma
                hit = z.abs() >= threshold
                if hit.any():
                    yield pd.DataFrame(
                        {
                            "event_id": rows.loc[hit, "event_id"].astype("int64"),
                            "event_type": event_type,
                            "value": rows.loc[hit, "value"],
                            "z": z[hit],
                        }
                    )
        # v and the DOUBLE product v*v are quantized at 6 dp BEFORE summing
        # (the catalog's dsum / q_gini product recipe): the summed unscaled
        # decimals stay within 2^53, where both engines' decimal→double
        # conversion is exactly rounded. (A full-scale 12-dp product sum
        # crosses 2^53 and DuckDB's two-step int128/10^s conversion can be
        # off by one ulp from Python's correctly-rounded float(Decimal).)
        qvals = [
            (
                Decimal(float(v)).quantize(q6, rounding=ROUND_HALF_UP),
                Decimal(float(v) * float(v)).quantize(q6, rounding=ROUND_HALF_UP),
            )
            for v in rows["value"]
        ]
        state.update(
            (
                int(n + len(rows)),
                float(s + float(sum((q for q, _ in qvals), Decimal(0)))),
                float(s2 + float(sum((p for _, p in qvals), Decimal(0)))),
            )
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=ANOMALY_OUT_SCHEMA,
        stateStructType=_ANOMALY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


GATE_OUT_SCHEMA = "doc_id BIGINT, b INT, prev_min BIGINT"
_GATE_STATE_SCHEMA = "min_id BIGINT"


def neardup_gate_stream(bands: DataFrame) -> DataFrame:
    """Streaming MinHash-LSH ingest gate — the stateful twin of
    plans.pipeline_queries.q_dedup_incremental's near-dup tier.

    Input is the banded signature stream (doc_id, b, bkey): one row per
    document per LSH band, produced map-side from the portable MinHash
    chain. State per (band, bucket) key is ONE number — the minimum doc_id
    seen in *previous* micro-batches — so every arriving document is gated
    against the entire already-ingested corpus at O(1) state per occupied
    bucket, never against the corpus rows themselves.

    Prefix semantics (the anomaly_stream contract): a batch's rows see only
    state accumulated from earlier batches — the emitted ``prev_min`` is
    read BEFORE the batch folds in, so within-batch pairs never match each
    other and the result is deterministic given the batch sequence,
    independent of partition/arrival order inside a batch. The per-doc
    verdict (any band hit => near-dup candidate) is a downstream stateless
    rollup; the oracle replays the same two-batch split in SQL, so the
    operator is value-checked end to end, not just row-counted.

    At 100 TB: state is bounded by occupied buckets (≤ min(4·docs, key
    space)), each a single BIGINT; in production the seen-set would be
    bootstrapped from the batch corpus index and aged with a timeout —
    both knobs orthogonal to the gating logic shown here.
    """
    import pandas as pd

    def fn(key, pdfs, state):
        parts = [pdf for pdf in pdfs]
        rows = (
            pd.concat(parts)
            if parts
            else pd.DataFrame({"doc_id": [], "b": [], "bkey": []})
        )
        prev = state.get[0] if state.exists else None
        if len(rows):
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"].astype("int64"),
                    "b": rows["b"].astype("int32"),
                    "prev_min": pd.array([prev] * len(rows), dtype="Int64"),
                }
            )
            cur = int(rows["doc_id"].min())
            state.update((cur if prev is None else min(prev, cur),))

    from pyspark.sql.streaming.state import GroupStateTimeout

    return bands.groupBy("b", "bkey").applyInPandasWithState(
        fn,
        outputStructType=GATE_OUT_SCHEMA,
        stateStructType=_GATE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def bloom_gate_stream(
    shingles: DataFrame, bits: DataFrame, m_bits: int, k_hashes: int
) -> DataFrame:
    """Streaming benchmark-decontamination gate — the incremental-ingest
    twin of plans.bloom_queries.q_bloom_decontaminate.

    STATELESS stream-static: the Bloom bitmap (a static ≤ m_bits/32-row
    (word_idx, word) relation built from the blocklist/eval corpus) is
    broadcast into every micro-batch, and each arriving (doc_id, sh)
    shingle row is probed with the same K-broadcast-join shift-and-mask
    plan the batch query uses — operators/bloom.py is the single
    implementation for both. No watermark, no state: a shingle's verdict
    depends only on the static bitmap, so the streamed result equals the
    batch result for ANY batching, which is what lets the registered query
    carry the batch oracle verbatim. At 100 TB the bitmap is the only
    thing shipped to executors (~1.2 MB at 10^6 members), and ingest-side
    cost stays map-only per batch; updating the blocklist = rebuilding the
    bitmap snapshot, the same static-side-refresh contract as
    q_stream_takedown's label snapshot."""
    from ..operators.bloom import bloom_probe

    return bloom_probe(shingles, "sh", bits, m_bits, k_hashes)
