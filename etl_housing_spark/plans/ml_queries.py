"""ML pipeline query (SURVEY.md §2.10) — rows-only ⊘ (iterative estimator
fitting is not DuckDB-SQL-expressible; the driver records a rows-only check
and tests/test_ml.py asserts the quantitative contract)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
