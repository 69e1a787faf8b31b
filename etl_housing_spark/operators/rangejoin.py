"""Bucketed range (interval) join — point-in-interval matching at scale.

A range join ``events.ts ∈ [iv.start, iv.end)`` has no equality key, so
Catalyst's only stock strategy is BroadcastNestedLoopJoin: O(|events|·|iv|)
comparisons on a single task per partition — the join that dies first at
100 TB. The standard distributed re-expression (what Databricks' range-join
optimization and KDB's window joins do under the hood) is **bucketing**:

1. quantize time into fixed-width buckets (here: calendar days);
2. explode each interval into the buckets it covers (``sequence()`` +
   ``explode`` — pure Catalyst, no Python);
3. equi-join events to interval-buckets on the bucket key — a normal
   shuffle/broadcast hash join Catalyst already knows how to distribute,
   with partial pruning for free;
4. re-apply the exact predicate to trim bucket-boundary false positives.

Each event belongs to exactly one bucket, so an (event, interval) pair can
match in at most one exploded row — no dedup step is needed. Cost drops
from |events|·|iv| to |events| + Σ interval-days, and the shuffle is an
ordinary hash exchange on the bucket key. Skewed buckets (a hot day) are
handled by AQE skew-join splitting like any other equi-join.

The reference never joins at all (SURVEY.md §2.3); this operator is part of
the engine's declared join surface extension, motivated by the time-series
queries (plans/timeseries_queries.py) a daily-scraped corpus enables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__bucket"


def bucketed_interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    how: str = "inner",
) -> DataFrame:
    """Join event rows to interval rows where ``start <= ts < end``.

    ``events`` and ``intervals`` must have disjoint column names apart from
    the three coordinate columns. Returns the joined rows with all columns
    from both inputs. The physical plan is an equi-join on the day bucket
    (SortMergeJoin / BroadcastHashJoin by Catalyst's choice), never a
    nested loop — asserted in tests/test_timeseries.py.

    ``how`` may be ``inner`` or ``left`` (left-outer on the events side):
    the exact predicate is part of the join CONDITION, not a post-filter,
    so null-extended rows of unmatched events survive. ``right``/``full``
    are rejected: intervals are exploded into one row per covered bucket
    before joining, so outer semantics on that side would emit one
    null-extended row per bucket instead of one per interval.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"bucketed_interval_join supports how='inner'|'left', got {how!r}: "
            "intervals are bucket-exploded, so right/full outer would duplicate "
            "null-extended interval rows once per covered bucket"
        )
    ev = events.withColumn(_BUCKET, F.to_date(F.col(ts)))
    # sequence() is inclusive; an exact-midnight end would add one bucket of
    # pure false positives, which the exact predicate below removes.
    iv = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(F.to_date(F.col(start)), F.to_date(F.col(end)), F.expr("INTERVAL 1 DAY"))
        ),
    )
    exact: Column = (F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end))
    cond = (ev[_BUCKET] == iv[_BUCKET]) & exact
    return ev.join(iv, on=cond, how=how).drop(ev[_BUCKET]).drop(iv[_BUCKET])
