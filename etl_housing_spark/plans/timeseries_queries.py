"""Time-series queries over the events table.

The reference's only time dimension is the scrape ``date`` column stamped per
run (trulia_scrape.py:146) and the daily-cron increment (0-ToDo.md:12) — it
never correlates observations across time. An analytics engine over that data
model needs the two canonical time-series operators a daily-scraped corpus
enables: *as-of enrichment* ("which listing state was current when X
happened" — the cross-table apartment-id tracking of 0-ToDo.md:54 extended
with time) and *sessionization* (grouping a user's event stream into
activity bursts — the per-run batching the cron log shows, logs/scraper.log,
lifted to per-entity time windows).

Both are implemented the scale-first way: **one shuffle on the entity key,
then sort-based window functions within partitions** — no range-explosion
join, no per-row subqueries. This is the shape that survives 100 TB: the
as-of union trick in particular is O(n log n) per partition versus the
O(n·m) of the naive inequality join Catalyst would otherwise produce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ._util import dsum, sql_dsum
from .registry import query

# --------------------------------------------------------------------------
# As-of join: for every purchase, the most recent click by the same user
# at-or-before the purchase timestamp.
#
# Implementation: union both streams with an is_click marker, sort each
# user's partition by (ts, is_click DESC, event_id) — clicks sort before
# purchases at equal ts so a same-instant click is visible, ties between
# clicks resolve to the larger event_id — then carry the last non-null
# click forward with last(..., ignorenulls=True). One exchange (hash on
# user_id), one sort, no join operator at all. DuckDB's ASOF JOIN computes
# the same relation; the oracle uses the identical window formulation so
# tie semantics are pinned, not engine-defined.
# --------------------------------------------------------------------------


@query(
    "q_asof_join",
    oracle="""
    WITH u AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click
      FROM events WHERE event_type IN ('click', 'purchase'))
    SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
           last_click_id, last_click_ts
    FROM (
      SELECT u.*,
        last_value(CASE WHEN is_click = 1 THEN event_id END IGNORE NULLS)
          OVER w AS last_click_id,
        last_value(CASE WHEN is_click = 1 THEN ts END IGNORE NULLS)
          OVER w AS last_click_ts
      FROM u
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_click DESC, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    WHERE is_click = 0
    """,
    description="as-of join: latest click at-or-before each purchase, per user — "
    "union + per-key sort + last(ignorenulls) carry-forward; one shuffle, no "
    "inequality join (the O(n·m) trap). DuckDB ASOF JOIN equivalent, window-pinned",
    tags=("timeseries", "window"),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    u = ev.filter(F.col("event_type").isin("click", "purchase")).withColumn(
        "is_click", F.when(F.col("event_type") == "click", 1).otherwise(0)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("is_click"), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_id = F.when(F.col("is_click") == 1, F.col("event_id"))
    click_ts = F.when(F.col("is_click") == 1, F.col("ts"))
    return (
        u.withColumn("last_click_id", F.last(click_id, ignorenulls=True).over(w))
        .withColumn("last_click_ts", F.last(click_ts, ignorenulls=True).over(w))
        .filter(F.col("is_click") == 0)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "last_click_id",
            "last_click_ts",
        )
    )


# --------------------------------------------------------------------------
# Sessionization: gap-based session assignment — a new session starts when
# a user has been inactive longer than the threshold. lag + conditional
# flag + running sum, all inside one window partition: one shuffle on
# user_id, sorted once, reused by all three window expressions (Catalyst
# collapses them into a single WindowExec). The streaming twin of this is
# session_window()/applyInPandasWithState; the batch form here is the one
# a backfill over 100 TB of history runs.
# --------------------------------------------------------------------------

_SESSION_GAP = "INTERVAL 12 HOURS"  # ≈ splits a third of consecutive-event pairs at sf0.01


@query(
    "q_sessionize",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts > lag(ts) OVER w + INTERVAL 12 HOURS
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      FROM o)
    SELECT user_id, session_seq, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM s GROUP BY user_id, session_seq
    """,
    description="gap-based sessionization (12h inactivity): lag + new-session flag + "
    "running sum, one shuffle on user_id — then per-session rollup. The batch "
    "backfill form of streaming session windows",
    tags=("timeseries", "window"),
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.col("ts") > prev_ts + F.expr(_SESSION_GAP)), 1
    ).otherwise(0)
    return (
        ev.withColumn("is_new", is_new)
        .withColumn("session_seq", F.sum("is_new").over(run))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


# --------------------------------------------------------------------------
# Range (interval) join — per-user onboarding window vs the global event
# stream. See operators/rangejoin.py for why this is a bucketed equi-join
# and not the BroadcastNestedLoopJoin Catalyst would pick for a raw
# inequality join. The oracle states the naive inequality join; the Spark
# side must produce the identical relation through the bucket rewrite.
# --------------------------------------------------------------------------


@query(
    "q_range_join",
    oracle="""
    WITH iv AS (
      SELECT user_id AS window_owner, MIN(ts) AS s,
             MIN(ts) + INTERVAL 3 DAY AS e
      FROM events GROUP BY user_id)
    SELECT window_owner, COUNT(*) AS n_events
    FROM iv JOIN events ev ON ev.ts >= iv.s AND ev.ts < iv.e
    GROUP BY window_owner
    """,
    description="range join: events falling in each user's first-3-days window — "
    "bucketed rewrite (interval→day-bucket explode + equi-join + exact refine) "
    "of the inequality join; hash join + AQE instead of a nested loop",
    tags=("timeseries", "join"),
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import bucketed_interval_join

    ev = load_table(spark, sf_dir, "events")
    iv = (
        ev.groupBy(F.col("user_id").alias("window_owner"))
        .agg(F.min("ts").alias("start"))
        .withColumn("end", F.col("start") + F.expr("INTERVAL 3 DAYS"))
    )
    joined = bucketed_interval_join(ev.select("event_id", "ts"), iv)
    return joined.groupBy("window_owner").agg(F.count(F.lit(1)).alias("n_events"))


# --------------------------------------------------------------------------
# Built-in session_window() — same gap-merge semantics as q_sessionize,
# expressed with Spark's native session window aggregate instead of the
# lag+flag+running-sum composition. The oracle states the classic SQL
# formulation (lag + >= boundary + running sum), so this query PROVES the
# built-in implements the textbook semantics bit-for-bit. Boundary detail:
# session_window closes at ts + gap exclusive, i.e. an event exactly gap
# later starts a NEW session — the oracle uses >= accordingly (q_sessionize
# uses > ; both are valid conventions, pinned per query).
# --------------------------------------------------------------------------


@query(
    "q_session_window",
    oracle="""
    WITH o AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts >= lag(ts) OVER w + INTERVAL 12 HOURS
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
      FROM o)
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) + INTERVAL 12 HOURS AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, seq
    """,
    description="native session_window() gap-merge aggregate, oracle-checked against the "
    "classic lag+running-sum SQL formulation — proves the built-in's boundary "
    "semantics (close at ts+gap exclusive) match the textbook definition",
    tags=("timeseries", "window"),
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "12 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "q_gapfill",
    # time_bucket == Spark's window().start for hour buckets (q_window_sliding
    # established the equivalence); generate_series and explode(sequence)
    # produce the identical hourly grid from the same min/max bounds.
    oracle="""
    WITH b AS (
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS ws, COUNT(*) AS n
      FROM events GROUP BY event_type, ws),
    bounds AS (
      SELECT MIN(time_bucket(INTERVAL '1 hour', ts)) AS lo,
             MAX(time_bucket(INTERVAL '1 hour', ts)) AS hi
      FROM events),
    grid AS (
      SELECT t.event_type, unnest(generate_series(bounds.lo, bounds.hi,
                                                  INTERVAL '1 hour')) AS ws
      FROM (SELECT DISTINCT event_type FROM events) t, bounds)
    SELECT g.event_type, g.ws AS window_start,
           CAST(COALESCE(b.n, 0) AS BIGINT) AS n_events
    FROM grid g LEFT JOIN b ON g.event_type = b.event_type AND g.ws = b.ws
    """,
    description="time-bucket gap filling: the dense hourly grid per event type with "
    "zero-filled silent hours — the report shape monitoring and rate-limit audits "
    "need (a missing bucket is invisible in a plain groupBy). The heavy work is one "
    "partial-agg-friendly grouped count; the grid is (types × hours) — tiny, built "
    "from a 1-row bounds aggregate and exploded in-plan, then the aggregated counts "
    "join it at grid cardinality, not event cardinality",
    tags=("timeseries",),
)
def q_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hour = F.window("ts", "1 hour").getField("start")
    b = (
        ev.groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("event_type", F.col("w.start").alias("ws"), "n")
    )
    bounds = ev.select(hour.alias("h")).agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    types = ev.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("ws"),
        )
    )
    return (
        grid.join(b, ["event_type", "ws"], "left")
        .select(
            "event_type",
            F.col("ws").alias("window_start"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        )
    )


@query(
    "q_rolling_range",
    # epoch seconds: unix_seconds(cast NTZ→LTZ) under the UTC-pinned session
    # == floor(epoch(ts)) in DuckDB — verified value-identical; the RANGE
    # frame is then pure integer arithmetic, and the rolling sum is
    # decimal-exact so frame-internal accumulation order cannot matter.
    oracle="""
    SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
    """,
    description="trailing 1-hour RANGE-frame window per user (rate limiting / "
    "rolling exposure: 'events and value in the last hour as of each event') — "
    "the time-valued frame q_window_running's ROWS frame cannot express: frame "
    "membership is defined by the timestamp delta, not row adjacency. One "
    "shuffle on the entity key, per-partition sort, single WindowExec",
    tags=("timeseries", "window"),
)
def q_rolling_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ep = F.expr("unix_seconds(cast(ts as timestamp))")
    w = (
        Window.partitionBy("user_id").orderBy("ep").rangeBetween(-3599, Window.currentRow)
    )
    return ev.select("event_id", "user_id", ep.alias("ep"), "value").select(
        "event_id",
        "user_id",
        "ep",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("sum_1h"),
    )


@query(
    "q_interpolate",
    # Linear interpolation at hourly grid points (the pandas
    # resample().interpolate() / TimescaleDB interpolate() operator): knot
    # lookup is the as-of union trick run in BOTH directions from one sort —
    # prev = last non-null over the preceding frame, next = first non-null
    # over the following frame, same WindowExec ordering, no inequality
    # join. All time arithmetic is integer microseconds (unix_micros ↔
    # epoch_us — exact in both engines); the interpolation weight and blend
    # are one identical IEEE expression tree, rounded 6dp once.
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS t, value FROM events),
    bounds AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS lo, max(ts) AS hi
      FROM events GROUP BY user_id),
    grid AS (
      SELECT user_id, epoch_us(unnest(generate_series(lo, hi, INTERVAL 1 HOUR))) AS t
      FROM bounds),
    u AS (
      SELECT user_id, t, value AS v, event_id, 0 AS is_grid FROM ev
      UNION ALL
      SELECT user_id, t, NULL, -1, 1 FROM grid),
    c AS (
      SELECT user_id, t, is_grid,
             last_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t, is_grid, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t, is_grid, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             first_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t, is_grid, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t, is_grid, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM u)
    SELECT user_id, make_timestamp(t) AS grid_ts,
           ROUND(CASE WHEN nt IS NULL THEN pv
                      WHEN pt IS NULL THEN nv
                      ELSE pv + (nv - pv) * (CAST(t - pt AS DOUBLE)
                                             / CAST(nt - pt AS DOUBLE)) END,
                 6) AS v_interp
    FROM c WHERE is_grid = 1
    """,
    description="hourly linear-interpolation resample per user (the pandas "
    "resample().interpolate() / Timescale interpolate() operator): per-user "
    "hourly grid from a tiny bounds aggregate, knots and grid unioned, prev/"
    "next knot via last/first IGNORE NULLS over ONE sorted window pass in "
    "both frame directions — no inequality join, one shuffle on the entity "
    "key; integer-microsecond time math, identical IEEE blend",
    tags=("timeseries",),
)
def q_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t_us = F.expr("unix_micros(cast(ts as timestamp))")
    knots = ev.select(
        "user_id",
        t_us.alias("t"),
        F.col("value").alias("v"),
        "event_id",
        F.lit(0).alias("is_grid"),
    )
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"), F.max("ts").alias("hi")
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("g"),
    ).select(
        "user_id",
        F.expr("unix_micros(cast(g as timestamp))").alias("t"),
        F.lit(None).cast("double").alias("v"),
        F.lit(-1).cast("long").alias("event_id"),
        F.lit(1).alias("is_grid"),
    )
    u = knots.unionByName(grid)
    w = Window.partitionBy("user_id").orderBy("t", "is_grid", "event_id")
    knot_v = F.when(F.col("is_grid") == 0, F.col("v"))
    knot_t = F.when(F.col("is_grid") == 0, F.col("t"))
    c = u.select(
        "user_id",
        "t",
        "is_grid",
        F.last(knot_v, ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("pv"),
        F.last(knot_t, ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("pt"),
        F.first(knot_v, ignorenulls=True)
        .over(w.rowsBetween(0, Window.unboundedFollowing))
        .alias("nv"),
        F.first(knot_t, ignorenulls=True)
        .over(w.rowsBetween(0, Window.unboundedFollowing))
        .alias("nt"),
    )
    blend = (
        F.when(F.col("nt").isNull(), F.col("pv"))
        .when(F.col("pt").isNull(), F.col("nv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (
                (F.col("t") - F.col("pt")).cast("double")
                / (F.col("nt") - F.col("pt")).cast("double")
            )
        )
    )
    return (
        c.filter(F.col("is_grid") == 1)
        .select(
            "user_id",
            F.timestamp_micros("t").cast("timestamp_ntz").alias("grid_ts"),
            F.round(blend, 6).alias("v_interp"),
        )
    )


@query(
    "q_ewma",
    oracle=None,  # ⊘ ordered per-entity fold — not expressible as an associative
    # SQL aggregate (the closed form overflows); law-tested in
    # tests/test_operators.py: hand fixture, alpha=1 degeneracy, constant
    # fixed point, partitioning invariance. Value-level companion:
    # q_ewma_portable (hash-green final-value digest of the same
    # recurrence, bound to this series by test_ewma_portable_binds_*)
    description="per-user EWMA trend smoothing (s_t = alpha*v_t + (1-alpha)*s_(t-1)) "
    "via grouped applyInPandas — the declared batch pattern for order-dependent "
    "per-entity logic: one shuffle on the entity key, Arrow-batched sequential "
    "fold per group, O(1) state; batch twin of the applyInPandasWithState "
    "streaming operators",
    tags=("timeseries",),
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.smoothing import ewma_by_key

    ev = load_table(spark, sf_dir, "events")
    return ewma_by_key(ev, "user_id", ["ts", "event_id"], "value", alpha=0.3)


@query(
    "q_ewma_portable",
    # The hash-checked twin of q_ewma (VERDICT r12 #7 — the last rows-only
    # id without a value-level companion): the same order-sensitive
    # recurrence s_t = 0.3·v_t + 0.7·s_(t-1), expressed as an ordered-array
    # fold (the q_rolling_fingerprint_portable recipe: aggregate() ≡
    # list_reduce over a list collected in pinned (ts, event_id) order).
    # Per-row ARRAY folds are order-FIXED, so plain double arithmetic is
    # bit-safe cross-engine (no decimal casts needed — both engines execute
    # the identical 0.3*x + 0.7*a expression tree in the identical data-
    # defined order); the fold seed is the first value on both sides
    # (list_reduce has no explicit zero). Emits the FINAL smoothed value
    # per entity — the recurrence's full-history digest, so any ordering or
    # arithmetic divergence anywhere in the timeline changes the output.
    oracle="""
    WITH o AS (
      SELECT user_id,
             list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vs
      FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(len(vs) AS BIGINT) AS n_events,
           CAST(list_reduce(vs, (a, x) -> 0.3 * x + 0.7 * a) AS DOUBLE)
             AS ewma_final
    FROM o
    """,
    description="hash-checked per-user EWMA (final smoothed value): the "
    "order-sensitive recurrence s_t = 0.3*v_t + 0.7*s_(t-1) as an ordered-"
    "array fold — values collected in pinned (ts, event_id) order, then "
    "aggregate()/list_reduce execute the identical double expression in "
    "the identical data-defined order, so the fold is bit-exact cross-"
    "engine without decimal casts; one shuffle on the entity key, O(1) "
    "fold state — the value-level twin of q_ewma's applyInPandas series "
    "(which this digest pins end-to-end: any timeline divergence changes "
    "the final value)",
    tags=("timeseries",),
)
def q_ewma_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    o = (
        ev.groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("ts"),
                            F.col("event_id"),
                            F.col("value").cast("double").alias("value"),
                        )
                    )
                ),
                lambda s: s["value"],
            ).alias("vs")
        )
    )
    fold = F.expr(
        "aggregate(slice(vs, 2, size(vs) - 1), vs[0],"
        " (a, x) -> 0.3 * x + 0.7 * a)"
    )
    return o.select(
        "user_id",
        F.size("vs").cast("bigint").alias("n_events"),
        fold.cast("double").alias("ewma_final"),
    )


@query(
    "q_interarrival_stats",
    # Queueing diagnostics per event type: interarrival gaps from one lag
    # window over the per-type timeline, then mean (decimal-exact) and the
    # DISCRETE p95 by integer rank over the gap histogram (the q_mode_median
    # quantile rule — no interpolation, no float parity risk). Gaps are
    # integer microseconds end to end.
    oracle="""
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
      FROM events),
    h AS (
      SELECT event_type, gap_us, COUNT(*) AS cnt
      FROM g WHERE gap_us IS NOT NULL GROUP BY event_type, gap_us),
    w AS (
      SELECT event_type, gap_us, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY gap_us
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS tot
      FROM h)
    SELECT event_type,
           CAST(MIN(tot) AS BIGINT) AS n_gaps,
           ROUND(CAST(SUM(CAST(gap_us AS DECIMAL(20,0))
                          * CAST(cnt AS DECIMAL(18,0))) AS DOUBLE)
                 / MIN(tot) / 1000000.0, 6) AS mean_gap_s,
           ROUND(MIN(CASE WHEN 20 * cum >= 19 * tot THEN gap_us END)
                 / 1000000.0, 6) AS p95_gap_s
    FROM w GROUP BY event_type
    """,
    description="interarrival-gap diagnostics per event type (the queueing / "
    "ingest-health metric): one lag window for integer-microsecond gaps, "
    "decimal-exact mean, discrete type-1 p95 by integer rank over the gap "
    "histogram (20·cum >= 19·tot — no interpolation) — windows on the "
    "collapsed histogram, one shuffle on the type key",
    tags=("timeseries", "stats"),
)
def q_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    wlag = Window.partitionBy("event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_type", (us - F.lag(us).over(wlag)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    h = g.groupBy("event_type", "gap_us").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("gap_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("event_type")
    wf = h.select(
        "event_type",
        "gap_us",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("tot"),
    )
    return wf.groupBy("event_type").agg(
        F.min("tot").cast("bigint").alias("n_gaps"),
        F.round(
            # cast BEFORE multiplying: a long*long product wraps silently in
            # non-ANSI Spark before the decimal cast can save it
            F.sum(
                F.col("gap_us").cast("decimal(20,0)")
                * F.col("cnt").cast("decimal(18,0)")
            ).cast("double")
            / F.min("tot")
            / 1000000.0,
            6,
        ).alias("mean_gap_s"),
        F.round(
            F.min(
                F.when(20 * F.col("cum") >= 19 * F.col("tot"), F.col("gap_us"))
            )
            / 1000000.0,
            6,
        ).alias("p95_gap_s"),
    )


@query(
    "q_seasonal_profile",
    # The (day-of-week x hour) baseline grid an anomaly scorer normalizes
    # against: per-cell event counts and decimal-exact mean value. dayofweek
    # conventions differ across engines (Spark Sunday=1 vs DuckDB Sunday=0),
    # so the cell key uses ISO dow on both sides. One grouped pass; the grid
    # is 168 rows regardless of event volume.
    oracle=f"""
    SELECT isodow(ts) AS dow, CAST(hour(ts) AS BIGINT) AS hr,
           COUNT(*) AS n_events,
           ROUND({sql_dsum('value')} / COUNT(*), 6) AS avg_value
    FROM events GROUP BY 1, 2
    """,
    description="seasonal (ISO day-of-week x hour) baseline profile: per-cell "
    "event counts and decimal-exact mean value — the 168-row normalization "
    "grid behind seasonality-aware anomaly scoring and load forecasting; one "
    "grouped pass, explicit ISO dow because engine dayofweek conventions "
    "differ",
    tags=("timeseries", "stats"),
)
def q_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    iso_dow = F.dayofweek("ts")  # Spark: Sunday=1 .. Saturday=7
    # convert to ISO (Monday=1 .. Sunday=7): ((dayofweek + 5) % 7) + 1
    return (
        ev.groupBy(
            (((iso_dow + 5) % 7) + 1).cast("bigint").alias("dow"),
            F.hour("ts").cast("bigint").alias("hr"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(dsum("value") / F.count(F.lit(1)), 6).alias("avg_value"),
        )
    )


@query(
    "q_lead_time",
    # Order-to-ship lead time per order priority — the fulfillment SLA
    # report: integer day lags from the orders ⋈ lineitem join, decimal-
    # exact mean plus discrete median and p95 by integer rank over the
    # per-priority lag histogram (the q_mode_median / q_interarrival_stats
    # quantile rule). One fact-fact join on the order key, then windows on
    # the collapsed histogram only.
    oracle=f"""
    WITH lag_ AS (
      SELECT o.o_orderpriority AS prio,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS days
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    h AS (SELECT prio, days, COUNT(*) AS cnt FROM lag_ GROUP BY prio, days),
    w AS (
      SELECT prio, days, cnt,
             SUM(cnt) OVER (PARTITION BY prio ORDER BY days
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(cnt) OVER (PARTITION BY prio) AS tot
      FROM h)
    SELECT prio,
           CAST(MIN(tot) AS BIGINT) AS n_lines,
           ROUND(CAST(SUM(CAST(days AS DECIMAL(20,0))
                          * CAST(cnt AS DECIMAL(18,0))) AS DOUBLE)
                 / MIN(tot), 6) AS mean_days,
           CAST(MIN(CASE WHEN 2 * cum >= tot THEN days END) AS BIGINT)
             AS median_days,
           CAST(MIN(CASE WHEN 20 * cum >= 19 * tot THEN days END) AS BIGINT)
             AS p95_days
    FROM w GROUP BY prio
    """,
    description="order-to-ship lead time per priority (the fulfillment SLA "
    "report): integer day lags from one fact-fact join on the order key, "
    "decimal-exact mean + discrete median and p95 by integer rank over the "
    "per-priority lag histogram — windows on the collapsed histogram, one "
    "join shuffle",
    tags=("timeseries", "stats", "join"),
)
def q_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lag = orders.join(
        li, orders.o_orderkey == li.l_orderkey
    ).select(
        F.col("o_orderpriority").alias("prio"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days"),
    )
    h = lag.groupBy("prio", "days").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("prio")
        .orderBy("days")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("prio")
    wf = h.select(
        "prio",
        "days",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("tot"),
    )
    return wf.groupBy("prio").agg(
        F.min("tot").cast("bigint").alias("n_lines"),
        F.round(
            F.sum(
                F.col("days").cast("decimal(20,0)")
                * F.col("cnt").cast("decimal(18,0)")
            ).cast("double")
            / F.min("tot"),
            6,
        ).alias("mean_days"),
        F.min(F.when(2 * F.col("cum") >= F.col("tot"), F.col("days")))
        .cast("bigint")
        .alias("median_days"),
        F.min(F.when(20 * F.col("cum") >= 19 * F.col("tot"), F.col("days")))
        .cast("bigint")
        .alias("p95_days"),
    )


@query(
    "q_session_stats",
    # Session-duration distribution — the product metric on top of
    # q_sessionize's gap construction: per-session duration in integer
    # microseconds, then count, decimal-exact mean, and discrete median/p90
    # by integer rank over the duration histogram. Everything after the
    # sessionization windows runs on collapsed frames (sessions, then
    # distinct durations).
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts > lag(ts) OVER w + INTERVAL 12 HOURS
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS seq
      FROM o),
    sess AS (
      SELECT user_id, seq,
             epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us,
             COUNT(*) AS n_events
      FROM s GROUP BY user_id, seq),
    h AS (SELECT dur_us, COUNT(*) AS cnt FROM sess GROUP BY dur_us),
    w2 AS (
      SELECT dur_us, cnt,
             SUM(cnt) OVER (ORDER BY dur_us
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(cnt) OVER () AS tot
      FROM h)
    SELECT CAST(MIN(tot) AS BIGINT) AS n_sessions,
           ROUND(CAST(SUM(CAST(dur_us AS DECIMAL(20,0))
                          * CAST(cnt AS DECIMAL(18,0))) AS DOUBLE)
                 / MIN(tot) / 1000000.0, 6) AS mean_dur_s,
           ROUND(MIN(CASE WHEN 2 * cum >= tot THEN dur_us END)
                 / 1000000.0, 6) AS median_dur_s,
           ROUND(MIN(CASE WHEN 10 * cum >= 9 * tot THEN dur_us END)
                 / 1000000.0, 6) AS p90_dur_s
    FROM w2
    """,
    description="session-duration distribution over the 12h-gap sessionization: "
    "integer-microsecond durations per (user, session), count + decimal-exact "
    "mean + discrete median/p90 by integer rank over the duration histogram — "
    "the engagement-depth metric on top of q_sessionize, windows on collapsed "
    "frames only",
    tags=("timeseries", "stats", "behavior"),
)
def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.col("ts") > prev_ts + F.expr("INTERVAL 12 HOURS")), 1
    ).otherwise(0)
    s = ev.withColumn("seq", F.sum(is_new).over(run))
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    sess = s.groupBy("user_id", "seq").agg(
        (F.max(us) - F.min(us)).alias("dur_us")
    )
    h = sess.groupBy("dur_us").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.orderBy("dur_us").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    wf = h.select(
        "dur_us",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("tot"),
    )
    return wf.agg(
        F.min("tot").cast("bigint").alias("n_sessions"),
        F.round(
            F.sum(
                F.col("dur_us").cast("decimal(20,0)")
                * F.col("cnt").cast("decimal(18,0)")
            ).cast("double")
            / F.min("tot")
            / 1000000.0,
            6,
        ).alias("mean_dur_s"),
        F.round(
            F.min(F.when(2 * F.col("cum") >= F.col("tot"), F.col("dur_us")))
            / 1000000.0,
            6,
        ).alias("median_dur_s"),
        F.round(
            F.min(F.when(10 * F.col("cum") >= 9 * F.col("tot"), F.col("dur_us")))
            / 1000000.0,
            6,
        ).alias("p90_dur_s"),
    )


@query(
    "q_seasonal_anomaly",
    # The composition q_seasonal_profile exists for: each event scored
    # against ITS OWN (ISO dow x hour) cell's baseline — residual
    # z = (v - cell_mean) / cell_std — so a Saturday-night spike isn't
    # flagged just for being Saturday night. Cell stats use the Welch
    # recipe (decimal-exact Σv and 6-dp-quantized Σv², population std);
    # the 168-row grid broadcasts back onto the stream and the scoring is
    # map-only. Reported: the |z| >= 3.5 anomalies.
    oracle="""
    WITH e AS (
      SELECT event_id, value, isodow(ts) AS dow,
             CAST(hour(ts) AS BIGINT) AS hr
      FROM events),
    cell AS (
      SELECT dow, hr, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
             CAST(SUM(CAST(value * value AS DECIMAL(18,6))) AS DOUBLE) AS s2
      FROM e GROUP BY dow, hr),
    sc AS (
      SELECT e.event_id, e.value, e.dow, e.hr,
             (e.value - c.s / c.n)
               / sqrt(c.s2 / c.n - (c.s / c.n) * (c.s / c.n)) AS z
      FROM e JOIN cell c ON e.dow = c.dow AND e.hr = c.hr
      WHERE c.n >= 2 AND c.s2 / c.n - (c.s / c.n) * (c.s / c.n) > 0)
    SELECT event_id, value, dow, hr, ROUND(z, 6) AS z
    FROM sc WHERE abs(z) >= 3.5
    """,
    description="seasonality-aware anomaly scoring: each event's residual z "
    "against its own (ISO dow x hour) cell baseline — cell stats via the "
    "decimal-exact Welch recipe, the 168-row grid broadcast back onto the "
    "stream, map-only scoring, |z| >= 3.5 reported; the composition the "
    "seasonal-profile grid exists for, so weekend spikes aren't flagged for "
    "being weekends",
    tags=("timeseries", "stats", "behavior"),
)
def q_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    iso_dow = (((F.dayofweek("ts") + 5) % 7) + 1).cast("bigint")
    e = ev.select(
        "event_id",
        "value",
        iso_dow.alias("dow"),
        F.hour("ts").cast("bigint").alias("hr"),
    )
    cell = e.groupBy("dow", "hr").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("s"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(18,6)"))
        .cast("double")
        .alias("s2"),
    )
    mu = F.col("s") / F.col("n")
    var = F.col("s2") / F.col("n") - mu * mu
    z = (F.col("value") - mu) / F.sqrt(var)
    return (
        e.join(F.broadcast(cell), ["dow", "hr"])
        .where((F.col("n") >= 2) & (var > 0))
        .where(F.abs(z) >= 3.5)
        .select("event_id", "value", "dow", "hr", F.round(z, 6).alias("z"))
    )
