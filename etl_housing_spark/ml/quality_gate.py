"""Quality-gate classifier — the classification half of the ML surface.

The regression pipeline (price_model.py, M1-M8) mirrors the reference's
RidgeCV flow; a corpus pipeline's day-to-day model is a CLASSIFIER gating
documents (the quality filter). This is the DISTILLATION workflow: a
hand-tuned gate (functions.text.quality_score's weighted heuristic — the
thing q_quality_score computes) produces today's labels, and a
seed-deterministic ``LogisticRegression`` over the RAW signals (marker
ratio, token count, token length) learns to replace it — the standard path
from heuristic filters to trained ones (labels from the incumbent, then
re-labeled subsets as annotations arrive). The synthetic corpus's `lang`
column is deliberately NOT the target: testdata labels are independent of
the text (every language shares one vocabulary), so a lang model would be
fitting noise — measured AUC 0.50; distillation has real structure to
learn and the test demands AUC >= 0.95. Same no-leakage discipline as the
price model (scaler inside the Pipeline, fit on train only).

Distributed shape: feature derivation is pure Catalyst (one projection —
the same expressions as q_lang_id/q_quality_score, no UDF); LBFGS fitting
is tree-aggregated gradient passes over the train split; scoring is one
map-only transform. At 100 TB the feature projection is the only full-data
stage; fitting samples or runs on the full frame identically.

Determinism: randomSplit(seed=7) (the reference's seed discipline,
trulia_csv_to_nlp.ipynb:1528), fixed feature order, LBFGS from a zero
start — repeated fits on the same input give identical coefficients, which
tests/test_ml.py asserts, along with AUC ≥ 0.95 (the marker-ratio feature
separates 'en' by construction of the heuristic) and holdout-schema
stability.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

FEATURES = ["en_ratio", "n_tokens", "avg_token_len"]


def prepare_gate_features(docs: DataFrame) -> DataFrame:
    """doc_id, label (incumbent gate: quality_score >= 0.36, the corpus
    median), and the raw signal features — one Catalyst projection, no
    Python. The model never sees the composite score, only the signals."""
    n_tok = T.token_count("text")
    return docs.select(
        "doc_id",
        (T.quality_score("text") >= 0.36).cast("double").alias("label"),
        T.stopword_ratio("text").alias("en_ratio"),
        n_tok.cast("double").alias("n_tokens"),
        (F.length("text") / n_tok).alias("avg_token_len"),
    )


def fit_quality_gate(feats: DataFrame, seed: int = 7) -> tuple[PipelineModel, DataFrame, float]:
    """Returns (model, holdout predictions, holdout AUC)."""
    train, test = feats.randomSplit([0.75, 0.25], seed=seed)
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=FEATURES, outputCol="raw"),
            StandardScaler(inputCol="raw", outputCol="features", withMean=True, withStd=True),
            LogisticRegression(featuresCol="features", labelCol="label", maxIter=50),
        ]
    )
    model = pipe.fit(train)
    pred = model.transform(test)
    auc = BinaryClassificationEvaluator(
        labelCol="label", metricName="areaUnderROC"
    ).evaluate(pred)
    return model, pred, auc


def classifier_report(docs: DataFrame, seed: int = 7) -> DataFrame:
    """1-row metrics + per-feature coefficients — the rows-only query shape."""
    feats = prepare_gate_features(docs)
    model, pred, auc = fit_quality_gate(feats, seed)
    lr = model.stages[-1]
    spark = docs.sparkSession
    rows = [
        ("auc", float(auc)),
        ("intercept", float(lr.intercept)),
    ] + [(f"coef_{name}", float(c)) for name, c in zip(FEATURES, lr.coefficients)]
    return spark.createDataFrame(rows, "metric string, value double")
