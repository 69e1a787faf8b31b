"""Bloom-filter membership queries — the broadcast-bitmap scale path for
benchmark decontamination (SURVEY.md §2.13 LLM-pipeline extensions).

q_decontaminate (pipeline_queries.py) broadcasts the DISTINCT eval shingle
*set*: correct, but the broadcast grows with the blocklist. These queries
run the same contamination check through operators/bloom.py's portable
Bloom filter: the broadcast is a bitmap relation bounded at M/32 rows no
matter how many members went in, membership is K integer probes, and the
false-positive rate is *measured in-plan* against the exact set so the
trade is never a guess. Everything — the Kirsch-Mitzenmacher positions
(one md5 per key, position i = (h1 + i*h2) mod m, h2 forced ODD so the
stride is coprime to the power-of-two m and never degenerates), 32-bit
words, bit_or build, shift-and-mask test — is integer arithmetic both
engines compute identically, so build + probe hash-check end to end.

Sizing (documented for the 100-TB deployment, parameterized here): ~10
bits per member and K = ln(2)*bits/member ≈ 7 gives ~0.8% FPR. The
decontamination query sizes generously: M=2^16 against the sf0.01
fixture's ~700-member eval set → measured FPR 0 at that fixture, answer
identical to the exact check THERE; the superset-by-construction framing
is the general guarantee (no false negatives, ever), and the overshoot
grows with probe volume — q_bloom_overshoot measures it in-engine at any
scale (sf0.1 with odd-h2 hashing: +6 false-positive docs of 4826 exact vs q_decontaminate). The FPR query
probes a deliberately UNDERSIZED M=2^12 filter so the measured overshoot
is nonzero — the sizing dial a deployment reads before committing a
layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bloom import bloom_build, bloom_probe
from .pipeline_queries import _SHINGLE_DUCK, corpus_shingles
from .registry import query

_M = 65536  # decontamination bitmap bits (2^16 -> 2048 32-bit words)
_M_SMALL = 4096  # undersized bitmap for the FPR exhibit (2^12)
_K = 4  # salted hashes per key


def _bloom_sql(m: int) -> str:
    """Shared oracle scaffolding: shingles -> eval member set -> bitmap
    words -> per-(doc, shingle) Bloom verdict over the corpus side."""
    return f"""
    sh AS ({_SHINGLE_DUCK}),
    ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 37 = 0),
    salts AS (SELECT unnest(range({_K})) AS kk),
    ehash AS (
      SELECT sh,
             CAST('0x' || substr(md5(sh), 1, 8) AS BIGINT) AS h1,
             CAST('0x' || substr(md5(sh), 9, 8) AS BIGINT) | 1 AS h2
      FROM ev),
    epos AS (
      SELECT (h1 + kk * h2) % {m} AS pos FROM ehash CROSS JOIN salts),
    bits AS (
      SELECT pos // 32 AS word_idx,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS word
      FROM epos GROUP BY 1),
    corpus AS (SELECT doc_id, sh FROM sh WHERE doc_id % 37 <> 0),
    phash AS (
      SELECT doc_id, sh,
             CAST('0x' || substr(md5(sh), 1, 8) AS BIGINT) AS h1,
             CAST('0x' || substr(md5(sh), 9, 8) AS BIGINT) | 1 AS h2
      FROM corpus),
    ppos AS (
      SELECT doc_id, sh, (h1 + kk * h2) % {m} AS pos
      FROM phash CROSS JOIN salts),
    verdict AS (
      SELECT doc_id, sh,
             MIN(CASE WHEN (COALESCE(word, 0) >> CAST(pos % 32 AS INTEGER)) % 2 = 1
                      THEN 1 ELSE 0 END) AS hit
      FROM ppos LEFT JOIN bits ON ppos.pos // 32 = bits.word_idx
      GROUP BY doc_id, sh)
"""


# shared persisted explode (pipeline_queries.corpus_shingles): the exact
# check and the whole Bloom family reference one analyzed plan, so the
# CacheManager materializes the shingle frame once per session/sf_dir
_corpus_shingles = corpus_shingles


@query(
    "q_bloom_decontaminate",
    oracle=f"""
    WITH {_bloom_sql(_M)}
    SELECT doc_id, CAST(SUM(hit) AS BIGINT) AS n_hit
    FROM verdict GROUP BY doc_id HAVING SUM(hit) > 0
    """,
    description="Bloom-filter decontamination: q_decontaminate's eval-overlap "
    f"check with the eval shingle set replaced by a {_M}-bit/{_K}-hash Bloom "
    "bitmap — the broadcast is a (word_idx, word) relation bounded at M/32 "
    "rows regardless of blocklist size, membership is a broadcast equi-join "
    "on the word index + shift-and-mask, no shuffle ever lands on the corpus "
    "side beyond its own per-doc distinct. Supersets the exact answer by "
    "construction (no false negatives); the FPR twin measures the overshoot",
    tags=("pipeline", "bloom", "bench"),
)
def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _corpus_shingles(spark, sf_dir)
    ev = sh.filter(F.col("doc_id") % 37 == 0).select("sh").distinct()
    bits = bloom_build(ev, "sh", _M, _K)
    corpus = sh.filter(F.col("doc_id") % 37 != 0)
    probed = bloom_probe(corpus, "sh", bits, _M, _K)
    return (
        probed.groupBy("doc_id")
        .agg(F.sum("bloom_hit").cast("long").alias("n_hit"))
        .filter(F.col("n_hit") > 0)
    )


@query(
    "q_bloom_overshoot",
    oracle=f"""
    WITH {_bloom_sql(_M)},
    bl AS (SELECT doc_id FROM verdict GROUP BY doc_id HAVING SUM(hit) > 0),
    ex AS (SELECT DISTINCT c.doc_id FROM corpus c JOIN ev e ON c.sh = e.sh)
    SELECT CAST((SELECT COUNT(*) FROM bl) AS BIGINT) AS n_bloom_docs,
           CAST((SELECT COUNT(*) FROM ex) AS BIGINT) AS n_exact_docs,
           CAST((SELECT COUNT(*) FROM bl
                 WHERE doc_id NOT IN (SELECT doc_id FROM ex)) AS BIGINT)
             AS n_overshoot_docs,
           CAST((SELECT COUNT(*) FROM ex
                 WHERE doc_id NOT IN (SELECT doc_id FROM bl)) AS BIGINT)
             AS n_missed_docs
    """,
    description="the Bloom-vs-exact decontamination audit: doc sets from "
    "q_bloom_decontaminate and q_decontaminate compared in-engine — "
    "n_overshoot_docs is the false-positive overshoot (docs the bitmap "
    "flags that share no real shingle; measured sf0.01: 0, sf0.1: 6 of 4826) and "
    "n_missed_docs is provably 0 (a Bloom filter cannot miss a member). "
    "Makes the production FPR trade observable at any scale instead of a "
    "docstring claim; both legs reuse the same corpus-shingle explode",
    tags=("pipeline", "bloom"),
)
def q_bloom_overshoot(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _corpus_shingles(spark, sf_dir)
    ev = sh.filter(F.col("doc_id") % 37 == 0).select("sh").distinct()
    corpus = sh.filter(F.col("doc_id") % 37 != 0)
    bits = bloom_build(ev, "sh", _M, _K)
    bl = (
        bloom_probe(corpus, "sh", bits, _M, _K)
        .groupBy("doc_id")
        .agg(F.sum("bloom_hit").alias("n_hit"))
        .filter(F.col("n_hit") > 0)
        .select("doc_id")
    )
    ex = corpus.join(F.broadcast(ev), "sh").select("doc_id").distinct()
    # ONE full-outer join + ONE aggregate: each leg executes exactly once
    # (the earlier four-branch crossJoin form re-ran the K-probe leg and
    # the exact join ~3x each — the probe has no exchange to reuse)
    j = bl.withColumn("ib", F.lit(1)).join(
        ex.withColumn("ie", F.lit(1)), "doc_id", "full_outer"
    )
    return j.agg(
        F.sum(F.coalesce("ib", F.lit(0))).cast("long").alias("n_bloom_docs"),
        F.sum(F.coalesce("ie", F.lit(0))).cast("long").alias("n_exact_docs"),
        F.sum(F.when(F.col("ie").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_overshoot_docs"),
        F.sum(F.when(F.col("ib").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_missed_docs"),
    )


@query(
    "q_bloom_fpr",
    oracle=f"""
    WITH {_bloom_sql(_M_SMALL)},
    probes AS (
      SELECT sh, MIN(hit) AS hit FROM verdict GROUP BY sh),
    flagged AS (
      SELECT p.sh, p.hit, CASE WHEN e.sh IS NULL THEN 0 ELSE 1 END AS is_member
      FROM probes p LEFT JOIN ev e ON p.sh = e.sh)
    SELECT (SELECT COUNT(*) FROM ev) AS n_member,
           COUNT(*) AS n_probed,
           CAST(SUM(hit) AS BIGINT) AS n_bloom_pos,
           CAST(SUM(CASE WHEN hit = 1 AND is_member = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos,
           CAST(SUM(CASE WHEN hit = 0 AND is_member = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_neg,
           CAST((1000000 * SUM(CASE WHEN hit = 1 AND is_member = 0 THEN 1 ELSE 0 END))
             // COUNT(*) AS BIGINT) AS fp_per_million
    FROM flagged
    """,
    description="measured Bloom false-positive rate at a deliberately "
    f"UNDERSIZED bitmap ({_M_SMALL} bits vs ~700 members -> ~50% fill): "
    "every distinct corpus shingle probed, verdicts joined back to the "
    "exact member set — reports members, probes, Bloom positives, false "
    "positives, false negatives (provably 0: a Bloom filter cannot miss a "
    "member) and integer FP-per-million. The production sizing dial: rerun "
    "at candidate M/K and read the overshoot before committing a layout",
    tags=("pipeline", "bloom"),
)
def q_bloom_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _corpus_shingles(spark, sf_dir)
    ev = sh.filter(F.col("doc_id") % 37 == 0).select("sh").distinct()
    bits = bloom_build(ev, "sh", _M_SMALL, _K)
    probes = (
        sh.filter(F.col("doc_id") % 37 != 0).select("sh").distinct()
    )
    verdict = bloom_probe(probes, "sh", bits, _M_SMALL, _K)
    flagged = verdict.join(
        F.broadcast(ev.withColumn("is_member", F.lit(1))), "sh", "left"
    ).na.fill({"is_member": 0})
    n_member = ev.agg(F.count(F.lit(1)).alias("n_member"))
    return (
        flagged.agg(
            F.count(F.lit(1)).alias("n_probed"),
            F.sum("bloom_hit").cast("long").alias("n_bloom_pos"),
            F.sum(
                F.when((F.col("bloom_hit") == 1) & (F.col("is_member") == 0), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_false_pos"),
            F.sum(
                F.when((F.col("bloom_hit") == 0) & (F.col("is_member") == 1), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_false_neg"),
        )
        .crossJoin(F.broadcast(n_member))
        .select(
            "n_member",
            "n_probed",
            "n_bloom_pos",
            "n_false_pos",
            "n_false_neg",
            F.expr("(1000000 * n_false_pos) div n_probed").alias("fp_per_million"),
        )
    )
