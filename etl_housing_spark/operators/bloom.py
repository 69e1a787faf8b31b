"""Portable Bloom filter as a broadcast bitmap dimension table.

The 100-TB decontamination problem: the exact check (q_decontaminate,
plans/pipeline_queries.py) broadcasts the DISTINCT eval shingle set, which
works while the eval benchmarks are small but breaks when the blocklist
grows to ~10^8+ n-grams (a full eval-suite + copyright-takedown blocklist):
the broadcast is the full string set. The standard engine answer — what
Spark itself does for runtime join pruning (`spark.sql.optimizer.
runtimeFilter.bloomFilter.enabled`) and what the published dedup pipelines
use for membership at scale — is a Bloom filter: K salted hashes into an
M-bit bitmap. The bitmap is O(M) bytes regardless of how many members it
holds (~1.2 MB for M=2^23 at ~10^6 members / 1% FPR; 10 bits per member
rules the sizing), membership is K integer probes, false negatives are
impossible and false positives are bounded and measurable.

Spark-first formulation — everything stays JVM-side and declarative:

* the bitmap is a **DataFrame of (word_idx, word)** rows — 32-bit words so
  every value is a non-negative BIGINT (bit 31 → 2^31 fits positively;
  a 64-bit word's bit 63 would overflow the signed type on BOTH engines).
  Build = explode K salts per member → position → ``bit_or`` grouped by
  word index: one shuffle of K rows per member, output bounded by M/32
  rows no matter how many members went in.
* probing is a **broadcast equi-join on word_idx** (the bitmap relation is
  ≤ M/32 rows — broadcastable by construction) + a bit test; a probe key
  is Bloom-positive iff ALL K probed bits are set (``min(hit) = 1``).
  No shuffle lands on the corpus side beyond its own per-key distinct.

The hash is the repo's portable idiom — ``conv(substring(md5(salt:key),
1, 8), 16, 10)`` — so DuckDB reproduces every bit exactly
(``CAST('0x' || substr(md5(...), 1, 8) AS BIGINT)``); the plan queries
(plans/bloom_queries.py) hash-check build + probe end to end.

Reference parity: the reference pipeline has no blocklist-membership
operator (its dedup is pandas ``drop_duplicates``, advanced.ipynb); this
family is part of the declared LLM-pipeline extension surface
(SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_probe"]

_WORD_BITS = 32  # 32-bit words: 1 << 31 stays positive in a signed BIGINT


def _positions(df: DataFrame, key: str, m_bits: int, k_hashes: int) -> DataFrame:
    """Explode each key row into its K salted bit positions.

    h_k(s) = first 8 md5 hex digits of "k:s" as an integer, mod m_bits —
    non-negative by construction, bit-reproducible in DuckDB.
    """
    return df.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(k_hashes - 1))).alias("salt"),
    ).withColumn(
        "pos",
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col("salt"), F.col(key))), 1, 8),
            16,
            10,
        ).cast("long")
        % m_bits,
    )


def bloom_build(members: DataFrame, key: str, m_bits: int, k_hashes: int) -> DataFrame:
    """Bloom bitmap of the ``key`` column as a (word_idx BIGINT, word BIGINT)
    relation — ≤ ``m_bits/32`` rows however many members went in, which is
    what makes the probe side broadcastable by construction."""
    return (
        _positions(members, key, m_bits, k_hashes)
        .groupBy(F.expr(f"pos div {_WORD_BITS}").alias("word_idx"))
        .agg(
            F.expr(
                f"bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD_BITS} AS INT)))"
            ).alias("word")
        )
    )


def bloom_probe(
    probes: DataFrame, key: str, bits: DataFrame, m_bits: int, k_hashes: int
) -> DataFrame:
    """Append ``bloom_hit`` (1 = maybe-member, 0 = definitely not) to every
    probe row. All K probed bits must be set; a word index absent from the
    bitmap is an all-zero word (left join + coalesce). The bitmap side is
    broadcast — the probe side is never shuffled for membership."""
    probe_cols = probes.columns
    hit = F.when(
        F.expr(
            f"(shiftright(coalesce(word, CAST(0 AS BIGINT)), "
            f"CAST(pos % {_WORD_BITS} AS INT)) % 2) = 1"
        ),
        1,
    ).otherwise(0)
    return (
        _positions(probes, key, m_bits, k_hashes)
        .join(
            F.broadcast(bits),
            F.expr(f"pos div {_WORD_BITS}") == bits["word_idx"],
            "left",
        )
        .withColumn("probe_hit", hit)
        .groupBy(*[F.col(c) for c in probe_cols])
        .agg(F.min("probe_hit").alias("bloom_hit"))
    )
