"""Data-quality expectations — declarative constraint checking in one pass.

The reference's only validation is implicit: pandas ``astype`` throwing on
a dirty value (trulia_scrape.py:178-180) and eyeballed ``df.info()`` /
``df.sample()`` (SURVEY.md §5.1). A production pipeline needs the contract
stated and counted: nulls, domains, ranges, key uniqueness, formats.

Design: every row-level expectation compiles to ``SUM(CASE WHEN violated
THEN 1 ELSE 0 END)`` inside ONE aggregate over ONE scan — adding an
expectation adds a column to the same HashAggregate, not a pass over the
data. Uniqueness (inherently cross-row) rides the same aggregate as
``COUNT(*) − COUNT(DISTINCT key)``. At 100 TB the whole contract costs one
partial+final aggregation, and the result is a single row of violation
counts — the shape a scheduler gates a pipeline on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> Column:
    return F.col(col).isNull()


def in_set(col: str, values: list) -> Column:
    return ~F.col(col).isin(values) | F.col(col).isNull()


def in_range(col: str, lo=None, hi=None) -> Column:
    c = F.col(col)
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (c < F.lit(lo))
    if hi is not None:
        cond = cond | (c > F.lit(hi))
    return cond | c.isNull()


def matches(col: str, pattern: str) -> Column:
    return ~F.col(col).rlike(pattern) | F.col(col).isNull()


def check(
    df: DataFrame,
    expectations: dict[str, Column],
    unique_on: list[str] | None = None,
) -> DataFrame:
    """One-row violation report: a count column per expectation.

    ``expectations`` maps report-column name → boolean *violation*
    expression (True = row violates). ``unique_on`` adds a
    ``dup_<cols>`` column counting surplus duplicate rows of that key.
    """
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
        for name, cond in expectations.items()
    ]
    if unique_on:
        aggs.append(
            (F.count(F.lit(1)) - F.countDistinct(*[F.col(c) for c in unique_on]))
            .cast("long")
            .alias("dup_" + "_".join(unique_on))
        )
    return df.agg(*aggs)


def observed_write(
    df: DataFrame,
    writer_fn,
    expectations: dict[str, Column],
    name: str = "expectations",
) -> dict:
    """Run ``writer_fn(df)`` (any action/sink call) with the expectation
    counts piggybacked on the SAME job via ``df.observe`` — ZERO extra scans.

    ``check()`` answers "is this batch acceptable" as its own aggregate
    job; at 100 TB you do not want to pay a second full pass just to learn
    what the write already saw. The Observation API attaches
    ``CollectMetrics`` to the plan: every expectation is evaluated on the
    rows as they stream through the write, and the violation counts arrive
    on the driver when the action completes. This is the gate-after-write
    pattern: land the data in a staging path, read the observed counts,
    promote or quarantine — one scan total.

    Returns {expectation_name: violation_count, "rows": n}.

    Session hygiene: the job runs in a THROWAWAY ``newSession()`` (same
    SparkContext, fresh session state) reached through a global temp view.
    Registering an Observation materializes the owning session's
    ObservationManager, and MLlib's UDF closures capture their session —
    any later ``model.transform`` action on a session that ever observed
    fails with ``NotSerializableException: ObservationManager``. Isolating
    the observation in a discarded session keeps the caller's session
    serialization-clean; the write itself is context-level and lands
    identically.
    """
    import uuid

    from pyspark.sql import Observation

    tmp = f"__ehs_obs_{uuid.uuid4().hex[:8]}"
    df.createOrReplaceGlobalTempView(tmp)
    try:
        ns = df.sparkSession.newSession()
        ndf = ns.table(f"global_temp.{tmp}")
        obs = Observation(name)
        metrics = [F.count(F.lit(1)).alias("rows")] + [
            F.sum(F.when(cond, 1).otherwise(0)).alias(key)
            for key, cond in expectations.items()
        ]
        writer_fn(ndf.observe(obs, *metrics))
        return dict(obs.get)
    finally:
        df.sparkSession.catalog.dropGlobalTempView(tmp)
