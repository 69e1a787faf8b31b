"""Per-entity sequential smoothing — the grouped-custom-compute surface.

EWMA (exponentially weighted moving average) is the canonical operator that
does NOT decompose into Spark's associative aggregate algebra: the
recurrence s_t = α·v_t + (1−α)·s_{t−1} is an ordered fold, and the closed
form Σ v_i·(1−α)^(n−i) cannot be rewritten as a partial-aggregable sum
without (1−α)^(−i) factors that overflow doubles after a few hundred rows.
The honest distributed shape is therefore ``applyInPandas``: one shuffle on
the entity key, each group's timeline folded sequentially in an
Arrow-batched worker — the batch twin of the applyInPandasWithState
streaming operators (streaming/jobs.py), with the same state-size argument:
O(1) per entity, group size bounded by the entity's own history.

This is the engine's declared pattern for order-dependent per-entity logic
(trend smoothing, Kalman-style filters, per-user model scoring): Python at
ONE boundary, vectorized transfer, never a row-at-a-time UDF in a scan.

Correctness is law-tested (tests/test_operators.py): a hand-computed
fixture, α=1 degeneracy (EWMA == raw values), constant-series fixed point,
and partitioning invariance (same result at 1 and 32 shuffle partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ewma_by_key(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.3,
    out_col: str = "ewma",
) -> DataFrame:
    """(key, order..., value, ewma) — the smoothed series per entity.

    ``order_cols`` must be a total order within each key (ties would make
    any sequential operator nondeterministic — same contract as the
    window-function queries' tie-break columns).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.select(key_col, *order_cols, value_col).schema.fields
    ) + f", `{out_col}` double"

    def fold(pdf):
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        s = pdf[value_col].astype("float64").ewm(alpha=alpha, adjust=False).mean()
        pdf[out_col] = s
        return pdf[[key_col, *order_cols, value_col, out_col]]

    return (
        df.select(key_col, *order_cols, value_col)
        .groupBy(key_col)
        .applyInPandas(fold, schema=out_schema)
    )
