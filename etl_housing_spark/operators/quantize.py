"""Embedding scalar quantization — int8 storage for ANN at corpus scale.

At 100 TB the embedding column IS the storage bill: a 64-dim float32 vector
is 256 bytes/row; linear-scanning or shuffling those dominates every ANN
cost. Scalar quantization (FAISS ``SQ8``, Milvus/pgvector equivalents) maps
each dimension to an int8 code against per-dimension [min, max] ranges —
4× smaller, and distance on codes is within a bounded error of the true
distance. The IVF/LSH operators (operators/similarity.py) consume the codes
for candidate generation; exact re-ranking on the float column touches only
the candidate set.

Plan shape — two aggregates, no collect:
1. per-dimension ranges: posexplode → MIN/MAX keyed by position (the
   shuffle carries dim rows per partition, independent of corpus size);
2. quantize: broadcast the dim-sized range table back and compute
   ``round((x - lo) / (hi - lo) * levels)`` per element — map-only.

MIN/MAX are order-independent (unlike float SUM), and the quantize
arithmetic is the same IEEE expression tree in Spark and DuckDB, so the
codes are bit-identical cross-engine — q_quantize_int8 is fully
oracle-checked, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dimension_ranges(emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Per-dimension (pos, lo, hi) over the corpus — dim-sized output."""
    return (
        emb.select(F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.min(F.col("x").cast("double")).alias("lo"),
            F.max(F.col("x").cast("double")).alias("hi"),
        )
    )


def scalar_quantize(
    emb: DataFrame,
    levels: int = 255,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Long-form int8 codes: (vec_id, pos, code) with code in [0, levels].

    Long form (exploded) rather than re-assembled arrays: the downstream
    bucket/scan operators consume positions anyway, re-assembly would add a
    collect_list shuffle, and the long form is directly comparable against
    the SQL oracle. Degenerate dimensions (hi == lo) code to 0.
    """
    ranges = dimension_ranges(emb, id_col, vec_col)
    exploded = emb.select(id_col, F.posexplode(vec_col).alias("pos", "x"))
    x = F.col("x").cast("double")
    scale = F.col("hi") - F.col("lo")
    code = F.when(scale == 0, F.lit(0)).otherwise(
        F.round((x - F.col("lo")) / scale * levels).cast("int")
    )
    return (
        exploded.join(F.broadcast(ranges), "pos")
        .select(id_col, F.col("pos").cast("long").alias("pos"), code.alias("code"))
    )


def dequantize_error(
    emb: DataFrame,
    levels: int = 255,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Max absolute reconstruction error per dimension — the SQ guarantee
    check: |x - dequant(quant(x))| ≤ (hi - lo) / (2 * levels)."""
    ranges = dimension_ranges(emb, id_col, vec_col)
    exploded = emb.select(id_col, F.posexplode(vec_col).alias("pos", "x"))
    x = F.col("x").cast("double")
    scale = F.col("hi") - F.col("lo")
    code = F.when(scale == 0, F.lit(0)).otherwise(F.round((x - F.col("lo")) / scale * levels))
    recon = F.when(scale == 0, F.col("lo")).otherwise(F.col("lo") + code / levels * scale)
    return (
        exploded.join(F.broadcast(ranges), "pos")
        .groupBy("pos")
        .agg(F.max(F.abs(x - recon)).alias("max_err"), F.first(scale).alias("scale"))
    )
