"""Categorical/keyword encoding operators (SURVEY.md §2.9).

- ``keyword_flags``: the reference's 21-keyword manual one-hot with the
  order-sensitive strip-after-flag loop (trulia_csv_to_nlp.ipynb:473-494,
  cells 13,15) — a fold of pure Catalyst expressions, one codegen pass.
- ``get_dummies``: pandas ``pd.get_dummies(df, columns=[c], drop_first=True)``
  (cell 18). Dynamic column-per-distinct-value breaks plan-time schema
  fixity, so it is two-pass by construction (SURVEY §7.6 #3): pass 1
  collects the vocabulary (tiny distinct → driver), pass 2 generates one
  ``when()`` column per value in deterministic sorted order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_colname(value: str) -> str:
    """Reference's column-name normalization (cell 15):
    ``detail.replace(' ','_').replace('-','_')``."""
    return str(value).replace(" ", "_").replace("-", "_")


def keyword_flags(
    df: DataFrame, text_col: str, keywords: list[str], strip: bool = True,
    stripped_col: str = "stripped",
) -> DataFrame:
    """0/1 flag per keyword; each matched keyword is removed before testing
    the next, so the declared order is semantic — frozen, like the
    reference's list."""
    out = df.withColumn("__t", F.lower(F.col(text_col)))
    for kw in keywords:
        out = out.withColumn(
            normalize_colname(kw), F.when(F.col("__t").contains(kw), 1).otherwise(0)
        )
        if strip:
            out = out.withColumn("__t", F.replace(F.col("__t"), F.lit(kw), F.lit("")))
    if strip:
        out = out.withColumn(stripped_col, F.col("__t"))
    return out.drop("__t")


def get_dummies(df: DataFrame, col: str, drop_first: bool = True, prefix: str | None = None) -> DataFrame:
    """One-hot encode distinct values of ``col`` as 0/1 columns.

    Vocabulary pass collects only the distinct values (a pre-aggregated,
    tiny result — the one legitimate ``collect`` in this engine, SURVEY
    §7.0); ``drop_first`` drops the minimum value for pandas parity.
    At true high cardinality use pyspark.ml StringIndexer+OneHotEncoder
    (sparse vectors) instead of materialized columns — ml.price_model does.
    """
    values = sorted(
        r[0] for r in df.select(col).distinct().collect() if r[0] is not None
    )
    if drop_first and values:
        values = values[1:]
    p = prefix or col
    flags = [
        F.when(F.col(col) == v, 1).otherwise(0).alias(f"{p}_{normalize_colname(v)}")
        for v in values
    ]
    return df.select("*", *flags)
