"""Batch ⇄ stream equivalence (SURVEY.md §5.2 item 4, §2.11).

The same windowed aggregation computed via ``read`` and via ``readStream`` +
``trigger(availableNow)`` over the same files must produce identical rows —
the Structured Streaming re-expression of "cron job appends daily, consumer
re-reads the folder" is only correct if incremental == full recompute.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_housing_spark.catalog import load_table
from etl_housing_spark.streaming.jobs import (
    dedup_events,
    read_events_stream,
    run_available_now,
    tumbling_counts,
)

from .conftest import SF_SMOKE


def _as_sorted_tuples(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_tumbling_counts_stream_equals_batch(spark):
    stream_out = run_available_now(
        tumbling_counts(read_events_stream(spark, SF_SMOKE)), name="t_equiv"
    )
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    cols = ["window_start", "event_type", "n_events"]
    assert _as_sorted_tuples(stream_out, cols) == _as_sorted_tuples(batch, cols)
    assert stream_out.count() > 0


def test_stream_dedup_equals_batch_distinct(spark):
    stream_out = run_available_now(
        dedup_events(read_events_stream(spark, SF_SMOKE)), name="t_dedup"
    )
    batch_n = load_table(spark, SF_SMOKE, "events").dropDuplicates(["event_id"]).count()
    assert stream_out.count() == batch_n


def test_stream_static_join_enrichment(spark):
    from etl_housing_spark.streaming.jobs import enrich_with_dim

    dim = spark.createDataFrame(
        [("click", "ui"), ("purchase", "commerce")], "event_type string, category string"
    )
    enriched = enrich_with_dim(read_events_stream(spark, SF_SMOKE), dim, "event_type")
    out = run_available_now(enriched, name="t_enrich")
    batch = load_table(spark, SF_SMOKE, "events").join(dim, "event_type", "left")
    assert out.count() == batch.count()
    assert out.filter(F.col("category") == "ui").count() == batch.filter(
        F.col("category") == "ui"
    ).count()


def test_foreachbatch_upsert_idempotent(spark, tmp_path):
    from etl_housing_spark.sources.warehouse import ParquetWarehouse
    from etl_housing_spark.streaming.jobs import upsert_each_batch

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    events = read_events_stream(spark, SF_SMOKE).select("event_id", "event_type", "value")
    n_expected = load_table(spark, SF_SMOKE, "events").count()

    upsert_each_batch(events, wh, "events_mat", ["event_id"], str(tmp_path / "ck1"))
    assert wh.read("events_mat").count() == n_expected
    # fresh checkpoint → files re-processed; upsert keeps the table stable
    upsert_each_batch(events, wh, "events_mat", ["event_id"], str(tmp_path / "ck2"))
    assert wh.read("events_mat").count() == n_expected


def test_sessionize_stream_equals_batch_closed_sessions(spark):
    """The custom stateful operator (applyInPandasWithState) must emit
    exactly the batch sessionization's *closed* sessions — every session
    except each user's final (still-open) one, which lives in state."""
    from pyspark.sql import Window

    from etl_housing_spark.streaming.jobs import sessionize_stream

    stream_out = run_available_now(
        sessionize_stream(read_events_stream(spark, SF_SMOKE), gap="12 hours"),
        name="t_sess",
    )

    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.col("ts") > prev_ts + F.expr("INTERVAL 12 HOURS")), 1
    ).otherwise(0)
    batch = (
        ev.withColumn("session_seq", F.sum(is_new).over(run))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )
    batch_closed = batch.join(
        batch.groupBy("user_id").agg(F.max("session_seq").alias("session_seq")),
        ["user_id", "session_seq"],
        "left_anti",
    )

    cols = ["user_id", "session_seq", "n_events", "session_start", "session_end"]
    got = _as_sorted_tuples(stream_out, cols)
    want = _as_sorted_tuples(batch_closed, cols)
    assert len(got) > 0
    assert got == want


def test_anomaly_stream_scores_against_prefix_stats(spark, tmp_path):
    import math
    import os

    from etl_housing_spark.streaming.jobs import anomaly_stream

    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "event_type", "value")
    prefix = ev.filter(F.col("event_id") % 2 == 0)
    suffix = ev.filter(F.col("event_id") % 2 == 1)
    d = tmp_path / "stream_in"
    prefix.coalesce(1).write.parquet(str(d / "p1"))
    suffix.coalesce(1).write.parquet(str(d / "p2"))
    # pin modification times so the file source replays p1 strictly first
    now = 1_700_000_000
    for sub, t in (("p1", now - 1000), ("p2", now)):
        for f in (d / sub).iterdir():
            os.utime(f, (t, t))
    stream = (
        spark.readStream.schema("event_id BIGINT, event_type STRING, value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*"))
    )
    out = run_available_now(anomaly_stream(stream), name="anom_equiv")

    # expected: suffix rows scored against PREFIX-only population stats
    stats = {
        r["event_type"]: (r["n"], r["s"], r["s2"])
        for r in prefix.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.sum("value").alias("s"),
            F.sum(F.col("value") * F.col("value")).alias("s2"),
        )
        .collect()
    }
    expected = set()
    for r in suffix.collect():
        n, s, s2 = stats[r["event_type"]]
        mu = s / n
        var = s2 / n - mu * mu
        if n >= 2 and var > 0:
            z = (r["value"] - mu) / math.sqrt(var)
            if abs(z) >= 3.0:
                expected.add(r["event_id"])
    got = {r["event_id"] for r in out.collect()}
    assert got == expected
    assert out.count() == len(expected)


def test_interval_join_stream_equals_batch(spark):
    from etl_housing_spark.streaming.jobs import interval_join_streams

    stream_out = run_available_now(
        interval_join_streams(
            read_events_stream(spark, SF_SMOKE).filter(F.col("event_type") == "click"),
            read_events_stream(spark, SF_SMOKE).filter(F.col("event_type") == "view"),
        ),
        name="t_sjoin",
    )
    ev = load_table(spark, SF_SMOKE, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    batch = (
        c.join(
            v,
            (c.c_user == v.v_user)
            & (v.view_ts <= c.click_ts)
            & (v.view_ts >= c.click_ts - F.expr("INTERVAL 1 HOUR")),
        )
        .select(F.col("c_user").alias("user_id"), "click_id", "click_ts", "view_id", "view_ts")
    )
    cols = ["user_id", "click_id", "click_ts", "view_id", "view_ts"]
    assert _as_sorted_tuples(stream_out, cols) == _as_sorted_tuples(batch, cols)
    assert stream_out.count() > 0  # non-vacuous: clicks do have prior views


def test_stream_bloom_gate_equals_batch(spark):
    """The Bloom gate is stateless stream-static, so the two-batch replay
    must equal the batch q_bloom_decontaminate verdict set EXACTLY — any
    batching-dependence would break this frame equality."""
    from etl_housing_spark.plans import all_queries

    sf = "/root/testdata/sf0.001"
    qs = all_queries()
    streamed = {
        (r.doc_id, r.n_hit)
        for r in qs["q_stream_bloom_gate"].fn(spark, sf).collect()
    }
    batch = {
        (r.doc_id, r.n_hit)
        for r in qs["q_bloom_decontaminate"].fn(spark, sf).collect()
    }
    assert streamed == batch and len(streamed) > 0


def test_stream_rep_gate_equals_batch_cluster_reps(spark):
    """The streamed rep-gate verdicts must equal the batch
    q_dup_cluster_reps frame exactly for the two-batch replay — the
    stateless stream-static contract (same codec chains, same rep keys,
    any batching)."""
    from etl_housing_spark.plans import all_queries

    specs = all_queries()
    sf = "/root/testdata/sf0.001"
    streamed = {
        r.doc_id: (r.rep_text, r.rep_image, r.rep_audio, r.rep_video,
                   r.n_dup_modalities)
        for r in specs["q_stream_rep_gate"].fn(spark, sf).collect()
    }
    batch = {
        r.doc_id: (r.rep_text, r.rep_image, r.rep_audio, r.rep_video,
                   r.n_dup_modalities)
        for r in specs["q_dup_cluster_reps"].fn(spark, sf).collect()
    }
    assert streamed == batch and streamed


def test_no_data_batch_contract(spark):
    """r17 (VERDICT r16 ask #8 / ADVICE #2): every plan routed through the
    one-shot runners must be complete-mode, append-on-arrival, or stateless
    for the no-data-batch disable to apply; a plan whose FINAL FLUSH is the
    output (watermark/clock timeouts, outer stream-stream joins) must be
    detected so the runners keep the trailing batch — correct rows, one
    empty batch of cost — instead of silently dropping its last rows."""
    from etl_housing_spark.streaming.jobs import (
        _no_data_batch_safe,
        interval_join_streams,
        sessionize_stream,
    )

    ev = read_events_stream(spark, SF_SMOKE)
    # the catalog's shapes: complete-mode agg, arrival-append dedup,
    # NoTimeout stateful, inner stream-stream join — all provably safe
    assert _no_data_batch_safe(tumbling_counts(ev))
    assert _no_data_batch_safe(dedup_events(ev))
    assert _no_data_batch_safe(sessionize_stream(ev))
    clicks = ev.filter("event_type = 'click'")
    views = ev.filter("event_type = 'view'")
    assert _no_data_batch_safe(interval_join_streams(clicks, views))

    # outer stream-stream join: unmatched rows emit when the watermark
    # closes the window — the final flush IS output
    c = clicks.withWatermark("ts", "1 hour").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    v = views.withWatermark("ts", "1 hour").select(
        F.col("user_id").alias("vu"), F.col("ts").alias("vts")
    )
    outer = c.join(
        v,
        (F.col("cu") == F.col("vu"))
        & (F.col("vts") <= F.col("cts"))
        & (F.col("vts") >= F.col("cts") - F.expr("INTERVAL 1 hour")),
        "leftOuter",
    )
    assert not _no_data_batch_safe(outer)

    # event-time timeout stateful operator: emits on watermark advance
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):  # pragma: no cover - never executed
        yield from ()

    timed = (
        ev.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType="user_id BIGINT",
            stateStructType="n BIGINT",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    assert not _no_data_batch_safe(timed)
