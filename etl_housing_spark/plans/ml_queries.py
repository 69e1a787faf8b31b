"""ML pipeline query (SURVEY.md §2.10) — rows-only ⊘ (iterative estimator
fitting is not DuckDB-SQL-expressible; the driver records a rows-only check
and tests/test_ml.py asserts the quantitative contract)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml.price_model import build_pipeline, coefficient_table, prepare_part_features
from ..catalog import load_table
from .registry import query


@query(
    "q_ml_price_coeffs",
    oracle=None,
    description="ridge price model on part features → ranked coefficient table "
    "(M1-M8; trulia_csv_to_nlp.ipynb cells 22-36) — Pipeline(VectorAssembler → "
    "StandardScaler → LinearRegression) with deterministic seed-7 split",
    tags=("ml",),
)
def q_ml_price_coeffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    df, features = prepare_part_features(load_table(spark, sf_dir, "part"))
    train, _test = df.randomSplit([0.75, 0.25], seed=7)
    model = build_pipeline(features).fit(train)
    return coefficient_table(spark, model, features)


# --------------------------------------------------------------------------
# Closed-form simple linear regression — the value-checked representative
# of the model surface (q_ml_price_coeffs is rows-only: CrossValidator's
# internals aren't SQL-expressible). Slope/intercept from decimal-exact
# moments — the same component sums as q_corr — evaluated in one
# deterministic double expression on both engines. This is the p=1 case of
# the normal equations the MLlib solver uses; at 100 TB the moment
# aggregation is still one partial+final pass, and p×p normal equations
# stay driver-sized for any realistic feature count.
# --------------------------------------------------------------------------

_SLOPE_SQL = "(n * sxy - sx * sy) / (n * sxx - sx * sx)"


@query(
    "q_linreg",
    oracle=f"""
    WITH g AS (
      SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sxx
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           ROUND({_SLOPE_SQL}, 6) AS slope,
           ROUND(sy / n - ({_SLOPE_SQL}) * (sx / n), 6) AS intercept
    FROM g ORDER BY l_returnflag
    """,
    description="closed-form simple linear regression (price ~ quantity per returnflag) "
    "from decimal-exact moments — the p=1 normal equations, value-checked "
    "representative of the ML surface; one aggregate pass at any scale",
    tags=("ml", "agg"),
)
def q_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import load_table
    from ._util import dsum

    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(x).alias("sx"),
            dsum(y).alias("sy"),
            dsum(x * y).alias("sxy"),
            dsum(x * x).alias("sxx"),
        )
        .select(
            "l_returnflag",
            "n",
            F.round(F.expr(_SLOPE_SQL), 6).alias("slope"),
            F.round(
                F.expr(f"sy / n - ({_SLOPE_SQL}) * (sx / n)"), 6
            ).alias("intercept"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_ml_quality_gate",
    oracle=None,  # ⊘ iterative LBFGS fit — determinism + AUC bound asserted in
    # tests/test_ml.py (repeated fits bit-identical, holdout AUC >= 0.95)
    description="quality-gate distillation classifier (the trained replacement for "
    "the hand-tuned q_quality_score filter a corpus pipeline runs): Catalyst-only "
    "feature projection (marker ratio, token stats) -> seed-7 split -> scaler + "
    "LogisticRegression pipeline, tree-aggregated LBFGS; emits holdout AUC, "
    "intercept and per-feature coefficients as a metrics frame",
    tags=("ml",),
)
def q_ml_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.quality_gate import classifier_report

    return classifier_report(load_table(spark, sf_dir, "documents"))
