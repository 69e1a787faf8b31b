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
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.sql import DataFrame, Window
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


def rank_auc(pred: DataFrame, score_col: str, label_col: str = "label") -> float:
    """ROC AUC as the Mann-Whitney U statistic, pure DataFrame ops.

    AUC = (Σ midrank(positives) − n⁺(n⁺+1)/2) / (n⁺·n⁻), with midranks for
    tied scores (rank + (ties−1)/2 — the textbook estimator). Stays entirely
    in Catalyst: one sort-rank window + one aggregate, no RDD closure —
    deliberately NOT ``BinaryClassificationEvaluator``, whose RDD-based
    metrics serialize a closure that trips over a session that has ever run
    an Observation (CollectMetrics listener state is not serializable); the
    engine-side formulation is also the one you'd distribute at scale
    (windowed rank over score-sorted partitions or a binned approximation).
    """
    w_rank = Window.orderBy(score_col)
    w_tie = Window.partitionBy(score_col)
    ranked = pred.select(
        F.col(label_col),
        (
            F.rank().over(w_rank) + (F.count(F.lit(1)).over(w_tie) - 1) / 2.0
        ).alias("midrank"),
    )
    agg = ranked.agg(
        F.sum(F.when(F.col(label_col) == 1.0, F.col("midrank"))).alias("rank_sum"),
        F.sum((F.col(label_col) == 1.0).cast("long")).alias("n_pos"),
        F.sum((F.col(label_col) == 0.0).cast("long")).alias("n_neg"),
    ).first()
    if not agg.n_pos or not agg.n_neg:
        return float("nan")
    u = agg.rank_sum - agg.n_pos * (agg.n_pos + 1) / 2.0
    return float(u / (agg.n_pos * agg.n_neg))


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
    # positive-class probability as the ranking score (vector_to_array keeps
    # the extraction in Catalyst — no Python row handling)
    from pyspark.ml.functions import vector_to_array

    scored = pred.select(
        "label", vector_to_array("probability").getItem(1).alias("p1")
    )
    auc = rank_auc(scored, "p1")
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
