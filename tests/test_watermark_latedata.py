"""Watermark late-data semantics (SURVEY.md §2.11 ⊘ row): rows arriving
beyond the watermark horizon after the watermark has advanced must be
dropped from the windowed aggregate. Not DuckDB-expressible, so asserted
here: two availableNow runs over a growing folder (the incremental-ingest
shape), a parquet sink in append mode so only watermark-finalized windows
emit — batch 2 carries one in-horizon and one beyond-horizon late row."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etl_housing_spark.streaming.jobs import tumbling_counts

SCHEMA = "event_id BIGINT, ts TIMESTAMP, event_type STRING"


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _write_batch(spark, path, rows, n):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/b{n}"
    )


def _run_once(spark, src, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).option("recursiveFileLookup", True).parquet(src)
    agg = tumbling_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_late_rows_beyond_watermark_dropped(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))

    # batch 1: events up to 10:00 → watermark advances to 08:00 (2h horizon);
    # the 06:00 window finalizes and emits with exactly one event
    _write_batch(
        spark,
        src,
        [
            (1, _ts("2024-01-01 06:30:00"), "click"),
            (2, _ts("2024-01-01 10:00:00"), "click"),
        ],
        1,
    )
    _run_once(spark, src, out, ckpt)

    # batch 2: a row for the already-finalized 06:00 window (dropped), an
    # in-horizon late row for 09:00 (counted), and a 12:00 row that pushes
    # the watermark to 10:00 so the 09:00 window finalizes
    _write_batch(
        spark,
        src,
        [
            (3, _ts("2024-01-01 06:45:00"), "click"),  # too late: dropped
            (4, _ts("2024-01-01 09:30:00"), "click"),  # in horizon: counted
            (5, _ts("2024-01-01 12:00:00"), "click"),  # watermark → 10:00
        ],
        2,
    )
    _run_once(spark, src, out, ckpt)

    got = {
        (r.window_start.hour, r.n_events)
        for r in spark.read.parquet(out).filter(F.col("event_type") == "click").collect()
    }
    assert (6, 1) in got  # finalized before the late row — late row dropped
    assert (9, 1) in got  # in-horizon late row counted
    assert (6, 2) not in got
