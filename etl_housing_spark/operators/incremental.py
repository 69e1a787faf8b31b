"""Incremental aggregate maintenance — mergeable rollup state.

The reference's consumer recomputes everything from scratch on every run
(glob all daily CSVs + concat, trulia_csv_to_nlp.ipynb cells 6-8) even
though each day only *adds* a partition. At 100 TB that full recompute is
the difference between a 5-minute job and a 5-hour one.

The fix is the classic mergeable-state design every distributed aggregate
already uses internally (partial → final HashAggregate): persist the
*partial* state per group — (count, decimal sum) pairs, never averages —
and fold new partitions in with a group-by-sum MERGE. Averages and other
ratios are derived at read time. Properties:

- **associative + commutative**: partitions can merge in any order, so
  backfills, late partitions, and parallel merges all commute;
- **decimal sums**: merge order cannot change the result (plans/_util
  rationale) — incremental == full recompute *bit-exactly*, which is the
  invariant q_incremental_rollup proves against the full-recompute oracle;
- **O(|groups|) state**: the rollup table is the shuffle-reduced size, so
  the daily merge cost is |new partition| + |groups|, independent of
  history length.

COUNT/SUM/AVG merge by addition; MIN/MAX by min/max. Non-mergeable exact
forms (exact distinct, exact percentiles) need their scale-path sketches
instead (HLL via approx_count_distinct partials, t-digest) — that boundary
is documented in SCALE.md.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans._util import DEC


def rollup_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Partial-aggregate state for (count, sum, min, max) of ``value_col``
    per key group — the persistable, mergeable form."""
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(v).alias("n"),
        F.sum(v.cast(DEC)).alias("sum_dec"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    )


def merge_states(*states: DataFrame) -> DataFrame:
    """Fold any number of state tables into one — group-by-sum/min/max on
    the state columns. Associative and commutative by construction."""
    unioned = reduce(DataFrame.unionByName, states)
    keys = [c for c in unioned.columns if c not in ("n", "sum_dec", "min_v", "max_v")]
    return unioned.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_dec").alias("sum_dec"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finalize(state: DataFrame) -> DataFrame:
    """Derive the read-time aggregates from state: exact count/sum/avg/min/
    max. The decimal sum casts to double only here, once, so incremental
    and full-recompute paths produce identical doubles."""
    keys = [c for c in state.columns if c not in ("n", "sum_dec", "min_v", "max_v")]
    return state.select(
        *keys,
        F.col("n").alias("n"),
        F.col("sum_dec").cast("double").alias("sum_v"),
        (F.col("sum_dec").cast("double") / F.col("n")).alias("avg_v"),
        "min_v",
        "max_v",
    )
