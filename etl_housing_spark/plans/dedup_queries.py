"""Near-duplicate detection queries over documents (SURVEY.md §2.13).

q_neardup_ngram is the oracle-checked exact set-similarity form; the
MinHash/SimHash queries use Spark's built-in hash (not reproducible in
DuckDB) and are declared rows-only — their correctness is covered by unit
tests against the exact form (tests/test_operators.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators import dedup as D
from .registry import query


@query(
    "q_neardup_ngram",
    oracle="""
    WITH sh AS (
      SELECT doc_id AS id, unnest(list_distinct(string_split(text, ' '))) AS sh
      FROM documents),
    sizes AS (SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
      GROUP BY a.id, b.id)
    SELECT id_a, id_b,
           n_inter / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
    FROM inter
    JOIN sizes sa ON inter.id_a = sa.id
    JOIN sizes sb ON inter.id_b = sb.id
    WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.9
    """,
    description="exact token-set Jaccard near-dup pairs ≥ 0.9 (§2.13 n-gram Jaccard) — "
    "shingle self-join with inclusion-exclusion union",
    tags=("dedup",),
)
def q_neardup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, "doc_id", "text", n=1, threshold=0.9)


@query(
    "q_dedup_minhash",
    oracle=None,  # Spark murmur3 signatures — rows-only (⊘, SURVEY §2.13)
    description="MinHash+LSH near-dup candidates (shingle→minhash→band→bucket-join), "
    "estimated jaccard ≥ 0.7 — the linear-cost scale path for q_neardup_ngram",
    tags=("dedup",),
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_near_dups(docs, "doc_id", "text", num_hashes=16, bands=4, threshold=0.7)


@query(
    "q_dedup_simhash",
    oracle=None,  # Spark murmur3 bit votes — rows-only (⊘)
    description="SimHash near-dup pairs within Hamming distance 3 (32-bit, chunk-banded)",
    tags=("dedup",),
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_near_dups(docs, "doc_id", "text", max_hamming=3)


@query(
    "q_dedup_clusters",
    oracle=None,  # iterative min-label propagation — not SQL-expressible;
    # convergence + canonicalization laws tested in tests/test_operators.py
    description="near-dup clustering: minhash pairs → connected components "
    "(iterative min-label propagation, persisted per round) → canonical "
    "min-id survivor per cluster (§2.13 dedup; the full pipeline a training "
    "corpus dedup runs after pair generation)",
    tags=("dedup",),
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import canonicalize, dedup_clusters, minhash_near_dups

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_dups(docs, "doc_id", "text", num_hashes=16, bands=8, threshold=0.9)
    return canonicalize(docs, dedup_clusters(pairs), "doc_id").select("doc_id", "lang", "source")
