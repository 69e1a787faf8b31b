"""Price-model pipeline (SURVEY.md §2.10, M1-M8).

Re-expresses the reference's sklearn flow (trulia_csv_to_nlp.ipynb cells
22-36: feature/label split → train_test_split(seed 7) → StandardScaler fit
on train → RidgeCV over an alpha grid → 5-fold CV mean/std → holdout r2 →
ranked coefficient table) as one ``pyspark.ml.Pipeline`` — estimator fitting
is distributed tree-aggregation over the executors instead of a single-node
BLAS call, so the identical API call holds at 100 TB of training rows.

Mapping (reference file:line → here):
- M1 X=df[features]; y=df['price'] (trulia_csv_to_nlp.ipynb:1516-1517) →
  ``VectorAssembler(inputCols=features, outputCol='features')``
- M2 train_test_split(random_state=7) (:1528) → ``randomSplit([.75,.25], 7)``
- M3 StandardScaler fit-on-train (:1556-1560) → ``StandardScaler(withMean,
  withStd)`` inside the Pipeline (fit only sees the train split — same
  no-leakage discipline the reference hand-codes)
- M4 RidgeCV(alphas=np.linspace(.1,10,100)) (:1602-1603) →
  ``LinearRegression(elasticNetParam=0)`` + ``ParamGridBuilder`` over
  ``regParam``
- M5 5-fold CV mean/std (:1620-1624) → ``CrossValidator(numFolds=5)`` +
  avgMetrics/stdMetrics
- M6/M7 fit / predict / r2 (:1641-1671) → ``model.transform(test)`` +
  ``RegressionEvaluator(metricName='r2')``
- M8 ranked coefficient table (:1687-1731) → ``coefficient_table`` (sorted
  desc — the O2/O6 sort+top-k surface)

The listings price model trains on whatever numeric feature frame the caller
provides; ``prepare_part_features`` derives one from the testdata ``part``
table (label ``p_retailprice``, features = p_size + keyword flags over
p_type — the same manual-one-hot shape as the reference's 21 keyword flags,
trulia_csv_to_nlp.ipynb:473-494).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.ml.regression import LinearRegression
from pyspark.ml.tuning import CrossValidator, CrossValidatorModel, ParamGridBuilder
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# keyword → flag columns over p_type, mirroring the reference's manual
# one-hot from a fixed keyword list (trulia_csv_to_nlp.ipynb:473-494)
PART_TYPE_KEYWORDS = ("brass", "steel", "copper", "nickel", "tin", "anodized", "polished")

DEFAULT_ALPHAS = tuple(0.1 + i * 0.1 for i in range(10))  # compact stand-in for linspace(.1,10,100)


def prepare_part_features(part: DataFrame) -> tuple[DataFrame, list[str]]:
    """Numeric feature frame from the ``part`` table: label p_retailprice,
    features p_size + one flag per PART_TYPE_KEYWORDS match in p_type."""
    flags = [
        F.when(F.lower(F.col("p_type")).contains(kw), 1).otherwise(0).alias(f"kw_{kw}")
        for kw in PART_TYPE_KEYWORDS
    ]
    df = part.select(
        F.col("p_partkey"),
        F.col("p_size").cast("double").alias("p_size"),
        *flags,
        F.col("p_retailprice").cast("double").alias("price"),
    )
    features = ["p_size"] + [f"kw_{kw}" for kw in PART_TYPE_KEYWORDS]
    return df, features


def build_pipeline(
    features: list[str],
    reg_param: float = 1.0,
    categorical: list[str] | None = None,
) -> Pipeline:
    """VectorAssembler → StandardScaler(withMean, withStd) → ridge
    (LinearRegression elasticNetParam=0 == L2-only, sklearn Ridge).

    ``categorical`` columns go through StringIndexer → OneHotEncoder
    (dropLast=True == the reference's ``get_dummies(drop_first=True)``,
    trulia_csv_to_nlp.ipynb:1230) producing *sparse* vectors — the scale
    form of the zipcode dummies: a 100k-zipcode column costs one sparse
    entry per row, not 100k materialized columns.
    """
    from pyspark.ml.feature import OneHotEncoder, StringIndexer

    categorical = categorical or []
    stages: list = []
    vec_inputs = list(features)
    for c in categorical:
        stages.append(StringIndexer(inputCol=c, outputCol=f"{c}_idx", handleInvalid="keep"))
        stages.append(OneHotEncoder(inputCol=f"{c}_idx", outputCol=f"{c}_oh", dropLast=True))
        vec_inputs.append(f"{c}_oh")
    stages += [
        VectorAssembler(inputCols=vec_inputs, outputCol="raw_features"),
        StandardScaler(
            inputCol="raw_features", outputCol="features", withMean=True, withStd=True
        ),
        LinearRegression(
            featuresCol="features",
            labelCol="price",
            elasticNetParam=0.0,
            regParam=reg_param,
            solver="normal",
        ),
    ]
    return Pipeline(stages=stages)


def cv_fit(
    train: DataFrame,
    features: list[str],
    alphas: tuple[float, ...] = DEFAULT_ALPHAS,
    num_folds: int = 5,
    seed: int = 7,
) -> CrossValidatorModel:
    """RidgeCV analog: grid over regParam, k-fold CV, r2 selection metric.
    ``parallelism`` fits grid points concurrently — the distributed answer
    to sklearn's sequential alpha loop."""
    pipeline = build_pipeline(features)
    lr = pipeline.getStages()[-1]
    grid = ParamGridBuilder().addGrid(lr.regParam, list(alphas)).build()
    cv = CrossValidator(
        estimator=pipeline,
        estimatorParamMaps=grid,
        evaluator=RegressionEvaluator(labelCol="price", metricName="r2"),
        numFolds=num_folds,
        seed=seed,
        parallelism=4,
    )
    return cv.fit(train)


def evaluate_r2(model: PipelineModel | CrossValidatorModel, test: DataFrame) -> float:
    """Holdout r2 (trulia_csv_to_nlp.ipynb:1641-1645 cross_val_predict+r2)."""
    pred = model.transform(test)
    return RegressionEvaluator(labelCol="price", metricName="r2").evaluate(pred)


def coefficient_table(
    spark: SparkSession, model: PipelineModel | CrossValidatorModel, features: list[str]
) -> DataFrame:
    """Ranked (feature, coefficient) table (M8; trulia_csv_to_nlp.ipynb
    cells 33-36) — coefficients are a driver-side vector of len(features),
    never big; the DataFrame exists so downstream sort/top-k compose."""
    pm = model.bestModel if isinstance(model, CrossValidatorModel) else model
    lr = pm.stages[-1]
    rows = list(zip(features, [float(c) for c in lr.coefficients]))
    return spark.createDataFrame(rows, "feature string, coefficient double").orderBy(
        F.desc("coefficient")
    )
