"""Deterministic sampling / splitting queries (training-corpus surface).

Both queries are fully oracle-checked — the point of hash-based assignment
is that two engines (and two runs, and two cluster sizes) agree row-for-row,
and the DuckDB twin proves it: Spark ``conv(substring(md5(k),1,8),16,10)``
== DuckDB ``CAST('0x' || substr(md5(k),1,8) AS BIGINT)``.

Scale notes in operators/sampling.py: the split is a shuffle-free
projection; the per-key sample is one window shuffle on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators import sampling as SA
from .registry import query

# DuckDB twin of operators.sampling.hash_bucket (salt='', sep=\x1f)
_BUCKET_SQL = (
    "CAST('0x' || substr(md5(concat_ws(chr(31), '', CAST(doc_id AS VARCHAR))), 1, 8) AS BIGINT)"
    " % 10000"
)


@query(
    "q_split_assign",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_BUCKET_SQL} < 8000 THEN 'train'
                WHEN {_BUCKET_SQL} < 9000 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    description="deterministic train/val/test split by content hash of the document key "
    "(§ training pipeline): stable across runs/engines/partitionings, shuffle-free "
    "projection; oracle verifies the exact per-row assignment",
    tags=("sampling",),
)
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return SA.deterministic_split(
        docs, ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split")


@query(
    "q_sample_per_key",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY md5(concat_ws(chr(31), CAST(o_orderkey AS VARCHAR)))
             ) AS rn
      FROM orders)
    SELECT o_custkey, o_orderkey FROM ranked WHERE rn <= 2
    """,
    description="deterministic 2-per-customer order sample: grouped top-k on the md5 "
    "order — a reproducible reservoir sample with one window shuffle and no rand()",
    tags=("sampling",),
)
def q_sample_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return SA.sample_per_key(orders, ["o_custkey"], ["o_orderkey"], k=2).select(
        "o_custkey", "o_orderkey"
    )


@query(
    "q_weighted_sample",
    # Deterministic Bernoulli sampling with per-row inclusion probability =
    # the row's quality weight (the training-mix primitive "sample documents
    # proportional to quality"): keep iff hash-uniform(id) < weight.
    # hash-uniform = first-8-hex of md5 scaled to [0,1) — identical
    # construction on both engines, so membership is row-for-row
    # reproducible under any run, partitioning, or cluster size (the
    # property rand()-based sampling can never give). Map-only, no shuffle.
    oracle="""
    WITH w AS (
      SELECT doc_id, n_chars,
             LEAST(n_chars / 400.0, 1.0) AS weight,
             CAST('0x' || substr(md5(concat_ws(chr(31), 'ws', CAST(doc_id AS VARCHAR))), 1, 8)
                  AS BIGINT) / 4294967296.0 AS u
      FROM documents)
    SELECT doc_id, n_chars, ROUND(weight, 6) AS weight
    FROM w WHERE u < weight
    """,
    description="deterministic weighted Bernoulli sample (inclusion probability = "
    "per-doc quality weight, here length-saturation): keep iff md5-uniform(id) < "
    "weight — row-for-row reproducible across engines/runs/partitionings, "
    "map-only and shuffle-free; the training-mix primitive for 'sample "
    "proportional to quality' at corpus scale",
    tags=("sampling",),
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("\x1f", F.lit("ws"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(4294967296.0)
    )
    weight = F.least(F.col("n_chars") / 400.0, F.lit(1.0))
    return (
        docs.select("doc_id", "n_chars", weight.alias("weight"), u.alias("u"))
        .filter(F.col("u") < F.col("weight"))
        .select("doc_id", "n_chars", F.round("weight", 6).alias("weight"))
    )
