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
