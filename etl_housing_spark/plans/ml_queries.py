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


# --------------------------------------------------------------------------
# Closed-form RIDGE regression over a part-price feature set — the
# oracle-checked twin that closes the ML rows-only island (round-4 verdict
# item 3). Exact recipe:
#   1. one decimal-exact aggregate pass over `part` collects all first and
#      second raw moments of the K features + label (the K×K
#      normal-equation inputs; still one partial+final HashAggregate at
#      100 TB, the single-row result broadcasts for free);
#   2. correlation gram A = n·R + (n·λ/σy)·I and rhs g = n·ρ_y are derived
#      algebraically from the raw moments, in doubles via IDENTICAL
#      expression trees on both engines;
#   3. the K×K SPD system is solved by symbolically UNROLLED Gaussian
#      elimination (no pivoting needed: SPD + ridge diagonal), K−1
#      elimination + K back-substitution layers of shared SQL snippets evaluated
#      by Catalyst and DuckDB alike — bit-identical, so the coefficients
#      hash-match the oracle;
#   4. the system mirrors MLlib WeightedLeastSquares (solver="normal")
#      EXACTLY: WLS internally standardizes features AND label by their
#      POPULATION std and scales regParam by 1/σy, i.e. it solves
#      (R + (λ/σy)·I)·β̂ = ρ_y with R the feature correlation matrix and
#      ρ_y the feature–label correlations, then maps back to the
#      StandardScaler(sample-σ) input space: coef_j = β̂_j·σy·√(n/(n−1)).
#      (Convention verified numerically to 1.5e-12 against the fitted
#      pipeline; tests/test_ml.py asserts 1e-5 value + sign + ranking
#      agreement.)  Intercept = ȳ since the scaled features are centered.
# --------------------------------------------------------------------------

_RIDGE_LAM = "1.0"  # matches build_pipeline(reg_param=1.0)
# p_size + drop-first one-hot over the p_type categories present in the
# testdata (STANDARD is the baseline — the reference's
# get_dummies(drop_first=True) convention, trulia_csv_to_nlp.ipynb:1230).
# The PART_TYPE_KEYWORDS metal flags are zero-variance on this data
# (σ=0 ⇒ standardization undefined), so the checked twin uses the flags
# that carry signal.
_RIDGE_TYPE_TOKENS = ("economy", "large", "medium", "promo", "small")
_RIDGE_FEATURES = ("p_size",) + tuple(f"t_{t}" for t in _RIDGE_TYPE_TOKENS)
_K = len(_RIDGE_FEATURES)  # 6


def ridge_feature_frame(part: DataFrame) -> DataFrame:
    """(x0..x{K-1}, y) projection: p_size + drop-first p_type flags,
    label p_retailprice. Shared with the MLlib tolerance test."""
    flags = [
        F.when(F.lower(F.col("p_type")).contains(t), 1.0)
        .otherwise(0.0)
        .alias(f"x{i + 1}")
        for i, t in enumerate(_RIDGE_TYPE_TOKENS)
    ]
    return part.select(
        F.col("p_size").cast("double").alias("x0"),
        *flags,
        F.col("p_retailprice").cast("double").alias("y"),
    )


def _ridge_moment_aggs() -> list[tuple[str, str]]:
    """(name, sql-expr-to-SUM) pairs: first moments s0..s{K} and second raw
    moments p{i}_{j} for i<=j over features x0..x{K-1} and label y
    (index K), including the label's own second moment p{K}_{K} = y·y
    (needed for the population σy that scales MLlib's effective regParam)."""
    v = [f"x{i}" for i in range(_K)] + ["y"]
    out = [(f"s{i}", v[i]) for i in range(_K + 1)]
    for i in range(_K):
        for j in range(i, _K):
            out.append((f"p{i}_{j}", f"{v[i]} * {v[j]}"))
        out.append((f"p{i}_{_K}", f"{v[i]} * y"))
    out.append((f"p{_K}_{_K}", "y * y"))
    return out


def _ridge_layers() -> list[list[str]]:
    """Sequential SELECT layers (each only references prior-layer columns)
    shared verbatim between Spark selectExpr and DuckDB CTEs.

    Layer 1: POPULATION std-devs sig0..sig{K-1} and sigy (the WLS internal
    convention) + label mean; divisors are nullif-guarded so a zero-variance
    feature yields NULL coefficients identically on both engines (Spark
    non-ANSI x/0 → NULL but DuckDB → ±inf, so the guard is what keeps a
    degenerate dataset engine-consistent rather than silently divergent).
    Layer 2: correlation gram a0_{i}_{j} = n·R_ij with MLlib's effective
    ridge n·λ/σy on the diagonal, rhs b0_{i} = n·ρ_iy.
    Layers 3..{K+1}: Gaussian elimination (symmetric Schur complements).
    Layers {K+2}..{2K+1}: back-substitution (row i froze after elimination
    step i) producing the standardized-space beta{i}; the final projection
    maps them back with ·σy·√(n/(n−1))."""
    lam = _RIDGE_LAM
    layers: list[list[str]] = []
    l1 = [f"nullif(sqrt((p{i}_{i} - s{i} * s{i} / n) / n), 0.0) AS sig{i}"
          for i in range(_K)]
    l1.append(
        f"nullif(sqrt((p{_K}_{_K} - s{_K} * s{_K} / n) / n), 0.0) AS sigy"
    )
    l1.append(f"s{_K} / n AS ybar")
    layers.append(l1)
    l2 = []
    for i in range(_K):
        for j in range(i, _K):
            e = f"(p{i}_{j} - s{i} * s{j} / n) / (sig{i} * sig{j})"
            if i == j:
                e = f"{e} + n * {lam} / sigy"
            l2.append(f"{e} AS a0_{i}_{j}")
        l2.append(f"(p{i}_{_K} - s{i} * s{_K} / n) / (sig{i} * sigy) AS b0_{i}")
    layers.append(l2)
    for k in range(_K - 1):
        lk = []
        for i in range(k + 1, _K):
            for j in range(i, _K):
                lk.append(
                    f"a{k}_{i}_{j} - a{k}_{k}_{i} * a{k}_{k}_{j} / a{k}_{k}_{k}"
                    f" AS a{k + 1}_{i}_{j}"
                )
            lk.append(
                f"b{k}_{i} - a{k}_{k}_{i} * b{k}_{k} / a{k}_{k}_{k}"
                f" AS b{k + 1}_{i}"
            )
        layers.append(lk)
    for i in range(_K - 1, -1, -1):
        terms = " - ".join(
            [f"b{i}_{i}"] + [f"a{i}_{i}_{j} * betastd{j}" for j in range(i + 1, _K)]
        )
        layers.append([f"({terms}) / a{i}_{i}_{i} AS betastd{i}"])
    # final projection back to the StandardScaler(sample-σ) input space
    layers.append(
        [f"betastd{i} * sigy * sqrt(n / (n - 1)) AS beta{i}" for i in range(_K)]
    )
    return layers


def _ridge_oracle() -> str:
    flags = ", ".join(
        f"CAST(CASE WHEN lower(p_type) LIKE '%{kw}%' THEN 1 ELSE 0 END AS DOUBLE)"
        f" AS x{i + 1}"
        for i, kw in enumerate(_RIDGE_TYPE_TOKENS)
    )
    from ._util import sql_dsum

    aggs = ", ".join(["COUNT(*) AS n"]
                     + [f"{sql_dsum(e)} AS {nm}" for nm, e in _ridge_moment_aggs()])
    ctes = [
        "feat AS (SELECT CAST(p_size AS DOUBLE) AS x0, "
        f"{flags}, CAST(p_retailprice AS DOUBLE) AS y FROM part)",
        f"l0 AS (SELECT {aggs} FROM feat)",
    ]
    for idx, layer in enumerate(_ridge_layers()):
        ctes.append(f"l{idx + 1} AS (SELECT *, {', '.join(layer)} FROM l{idx})")
    last = f"l{len(_ridge_layers())}"
    rows = " UNION ALL ".join(
        [f"SELECT '{f}' AS feature, ROUND(beta{i}, 6) AS coef FROM {last}"
         for i, f in enumerate(_RIDGE_FEATURES)]
        + [f"SELECT '(intercept)' AS feature, ROUND(ybar, 6) AS coef FROM {last}"]
    )
    return f"WITH {', '.join(ctes)} SELECT feature, coef FROM ({rows}) ORDER BY feature"


@query(
    "q_ridge_coeffs_portable",
    oracle=_ridge_oracle(),
    description="closed-form ridge regression on part price (p_size + drop-first "
    "p_type flags → p_retailprice): one decimal-exact moment "
    "aggregate, MLlib-WLS-convention normal equations (R + (λ/σy)I)β̂ = ρ_y "
    "(population-σ standardization, coef = β̂·σy·√(n/(n−1))) solved by "
    "unrolled K×K Gaussian elimination in shared Spark/DuckDB SQL snippets — "
    "hash-checked, and tolerance-tested against the MLlib pipeline's fitted "
    "coefficients (tests/test_ml.py); the value-level anchor for the ML family",
    tags=("ml", "agg"),
)
def q_ridge_coeffs_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._util import dsum

    feat = ridge_feature_frame(load_table(spark, sf_dir, "part"))
    m = feat.agg(
        F.count(F.lit(1)).alias("n"),
        *[dsum(F.expr(e)).alias(nm) for nm, e in _ridge_moment_aggs()],
    )
    r = m
    for layer in _ridge_layers():
        r = r.selectExpr("*", *layer)
    stack_args = ", ".join(
        [f"'{f}', round(beta{i}, 6)" for i, f in enumerate(_RIDGE_FEATURES)]
        + ["'(intercept)', round(ybar, 6)"]
    )
    return r.selectExpr(
        f"stack({_K + 1}, {stack_args}) AS (feature, coef)"
    ).orderBy("feature")


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
