"""Semantic unit tests for the time-series operators (plans/timeseries_queries).

The oracle parity tests prove both engines agree; these pin the *intended*
semantics on hand-built micro-inputs where every tie and boundary case is
enumerable: same-instant click/purchase visibility, click-tie resolution,
per-user isolation, exact-gap vs over-gap session splitting.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _asof(spark, rows):
    """Run the q_asof_join window logic over inline (id, user, ts, type) rows."""
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string"
    )
    u = ev.filter(F.col("event_type").isin("click", "purchase")).withColumn(
        "is_click", F.when(F.col("event_type") == "click", 1).otherwise(0)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("is_click"), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        u.withColumn(
            "last_click_id",
            F.last(F.when(F.col("is_click") == 1, F.col("event_id")), ignorenulls=True).over(w),
        )
        .filter(F.col("is_click") == 0)
        .select("event_id", "last_click_id")
    )
    return {r.event_id: r.last_click_id for r in out.collect()}


def test_asof_basic_and_no_future_match(spark):
    got = _asof(
        spark,
        [
            (1, 7, _ts("2024-01-01T00:00:00"), "click"),
            (2, 7, _ts("2024-01-01T01:00:00"), "purchase"),  # matches click 1
            (3, 7, _ts("2024-01-01T02:00:00"), "click"),
            (4, 7, _ts("2024-01-01T01:30:00"), "purchase"),  # click 3 is in its future
        ],
    )
    assert got == {2: 1, 4: 1}


def test_asof_same_instant_click_is_visible(spark):
    t = _ts("2024-01-01T12:00:00")
    got = _asof(spark, [(10, 1, t, "click"), (11, 1, t, "purchase")])
    assert got == {11: 10}


def test_asof_click_tie_takes_larger_event_id(spark):
    t = _ts("2024-01-01T12:00:00")
    got = _asof(
        spark,
        [
            (20, 1, t, "click"),
            (21, 1, t, "click"),
            (22, 1, _ts("2024-01-01T13:00:00"), "purchase"),
        ],
    )
    assert got == {22: 21}


def test_asof_users_are_isolated_and_null_when_no_click(spark):
    got = _asof(
        spark,
        [
            (30, 1, _ts("2024-01-01T00:00:00"), "click"),
            (31, 2, _ts("2024-01-01T01:00:00"), "purchase"),  # user 2 never clicked
        ],
    )
    assert got == {31: None}


def _sessionize(spark, rows, gap="INTERVAL 1 HOURS"):
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, event_id long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(prev_ts.isNull() | (F.col("ts") > prev_ts + F.expr(gap)), 1).otherwise(0)
    out = (
        ev.withColumn("session_seq", F.sum(is_new).over(run))
        .select("user_id", "event_id", "session_seq")
        .collect()
    )
    return {(r.user_id, r.event_id): r.session_seq for r in out}


def test_sessionize_exact_gap_stays_over_gap_splits(spark):
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 1),
        (1, _ts("2024-01-01T01:00:00"), 2),  # exactly 1h later → same session
        (1, _ts("2024-01-01T02:00:00.000001"), 3),  # 1h + 1µs → new session
    ]
    got = _sessionize(spark, rows)
    assert got == {(1, 1): 1, (1, 2): 1, (1, 3): 2}


def test_sessionize_per_user_numbering_restarts(spark):
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 1),
        (2, _ts("2024-01-01T00:30:00"), 2),
        (1, _ts("2024-01-01T05:00:00"), 3),
        (2, _ts("2024-01-01T00:45:00"), 4),
    ]
    got = _sessionize(spark, rows)
    assert got == {(1, 1): 1, (1, 3): 2, (2, 2): 1, (2, 4): 1}


def test_asof_plan_has_single_exchange(spark):
    """The as-of union trick must cost exactly one hash exchange (on user_id) —
    no inequality join, no extra shuffles."""
    from etl_housing_spark.plans.timeseries_queries import q_asof_join

    plan = q_asof_join(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_bucketed_interval_join_matches_naive(spark):
    """The bucket rewrite must produce exactly the naive inequality join's
    relation, including boundary semantics (start inclusive, end exclusive)
    and intervals spanning multiple / zero buckets."""
    from etl_housing_spark.operators.rangejoin import bucketed_interval_join

    ev = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00")),  # exactly at a start → included
            (2, _ts("2024-01-03T12:00:00")),
            (3, _ts("2024-01-05T00:00:00")),  # exactly at an end → excluded
            (4, _ts("2024-02-01T09:30:00")),
        ],
        "event_id long, ts timestamp_ntz",
    )
    iv = spark.createDataFrame(
        [
            (100, _ts("2024-01-01T00:00:00"), _ts("2024-01-05T00:00:00")),  # 4-day span
            (200, _ts("2024-01-03T06:00:00"), _ts("2024-01-03T18:00:00")),  # sub-day
            (300, _ts("2024-03-01T00:00:00"), _ts("2024-03-02T00:00:00")),  # matches none
        ],
        "iv_id long, start timestamp_ntz, end timestamp_ntz",
    )
    got = {
        (r.iv_id, r.event_id)
        for r in bucketed_interval_join(ev, iv).select("iv_id", "event_id").collect()
    }
    naive = {
        (r.iv_id, r.event_id)
        for r in ev.join(iv, (ev.ts >= iv.start) & (ev.ts < iv.end))
        .select("iv_id", "event_id")
        .collect()
    }
    assert got == naive == {(100, 1), (100, 2), (200, 2)}

    # left join: unmatched events survive null-extended (the exact predicate
    # is part of the join condition, not a post-filter that would eat them)
    left = {
        (r.event_id, r.iv_id)
        for r in bucketed_interval_join(ev, iv, how="left").select("event_id", "iv_id").collect()
    }
    assert left == {(1, 100), (2, 100), (2, 200), (3, None), (4, None)}

    # right/full are rejected: exploded interval buckets would duplicate
    # null-extended interval rows
    import pytest

    with pytest.raises(ValueError, match="inner.*left"):
        bucketed_interval_join(ev, iv, how="full")


def test_range_join_plan_is_equi_join_not_nested_loop(spark):
    """The whole point of the bucket rewrite: Catalyst must execute an
    equi-join (SMJ/BHJ) on the bucket key, never BroadcastNestedLoopJoin."""
    from etl_housing_spark.plans.timeseries_queries import q_range_join

    plan = q_range_join(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or ("ShuffledHashJoin" in plan)


from hypothesis import given, settings
from hypothesis import strategies as st

_BASE = _ts("2024-01-01T00:00:00")


@settings(max_examples=12, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=60 * 24 * 20), min_size=1, max_size=25),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60 * 24 * 20),
            st.integers(min_value=0, max_value=60 * 24 * 6),
        ),
        min_size=1,
        max_size=10,
    ),
)
def test_bucketed_interval_join_property(event_mins, interval_specs):
    """For ANY events and ANY intervals (including empty ones, dur=0, and
    multi-week spans), the bucket rewrite equals the naive inequality join."""
    import datetime as _dt

    spark = _prop_spark()
    from etl_housing_spark.operators.rangejoin import bucketed_interval_join

    ev = spark.createDataFrame(
        [(i, _BASE + _dt.timedelta(minutes=m)) for i, m in enumerate(event_mins)],
        "event_id long, ts timestamp_ntz",
    )
    iv = spark.createDataFrame(
        [
            (j, _BASE + _dt.timedelta(minutes=s), _BASE + _dt.timedelta(minutes=s + d))
            for j, (s, d) in enumerate(interval_specs)
        ],
        "iv_id long, start timestamp_ntz, end timestamp_ntz",
    )
    got = {
        (r.iv_id, r.event_id)
        for r in bucketed_interval_join(ev, iv).select("iv_id", "event_id").collect()
    }
    want = {
        (j, i)
        for i, m in enumerate(event_mins)
        for j, (s, d) in enumerate(interval_specs)
        if s <= m < s + d
    }
    assert got == want


_PROP_SPARK = None


def _prop_spark():
    global _PROP_SPARK
    if _PROP_SPARK is None:
        from etl_housing_spark.session import get_session

        _PROP_SPARK = get_session(app_name="ehs-tests", shuffle_partitions=8)
    return _PROP_SPARK
