"""Invariant laws for the corpus-pipeline queries (plans/pipeline_queries.py):
conservation, bound, and exclusion properties that must hold on ANY input —
complementary to the value-exact oracle parity tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_housing_spark.catalog import load_table
from etl_housing_spark.plans import all_queries

from .conftest import SF_SMOKE

SPECS = all_queries()


def _q(spark, name):
    return SPECS[name].fn(spark, SF_SMOKE)


def test_seq_packing_conserves_tokens_and_docs(spark):
    out = _q(spark, "q_seq_packing").agg(
        F.sum("n_tokens").alias("tok"), F.sum("n_docs").alias("docs")
    ).collect()[0]
    docs = load_table(spark, SF_SMOKE, "documents")
    tot = docs.agg(
        F.sum(F.size(F.split("text", " "))).alias("tok"), F.count(F.lit(1)).alias("docs")
    ).collect()[0]
    assert out["tok"] == tot["tok"] and out["docs"] == tot["docs"]


def test_decontaminate_never_flags_eval_docs(spark):
    out = _q(spark, "q_decontaminate")
    assert out.filter((F.col("doc_id") % 37 == 0) | (F.col("n_hit") < 1)).count() == 0


def test_winsorize_bounds_and_counts(spark):
    for r in _q(spark, "q_winsorize").collect():
        assert r["lo"] <= r["hi"]
        assert r["lo"] <= r["winsorized_avg"] <= r["hi"]
        assert 0 <= r["n_clipped_lo"] <= r["n"] and 0 <= r["n_clipped_hi"] <= r["n"]


def test_class_weights_rebalance_to_total(spark):
    rows = _q(spark, "q_class_weights").collect()
    total = sum(r["n"] for r in rows)
    # Σ n_c · w_c = Σ n_c · total/(k·n_c) = total (weights exactly rebalance)
    assert abs(sum(r["n"] * r["weight"] for r in rows) - total) < 1e-3 * total


def test_mad_outliers_bounds(spark):
    for r in _q(spark, "q_mad_outliers").collect():
        assert r["mad"] >= 0
        assert 0 <= r["n_outliers"] <= r["n"]


def test_repetition_fractions_in_unit_interval(spark):
    out = _q(spark, "q_repetition")
    bad = out.filter(
        (F.col("dup_token_frac") < 0) | (F.col("dup_token_frac") >= 1)
        | (F.col("top_bigram_frac") <= 0) | (F.col("top_bigram_frac") > 1)
    )
    assert bad.count() == 0


def test_simhash_pairs_within_hamming_bound(spark):
    out = _q(spark, "q_simhash_pairs_portable")
    assert out.filter((F.col("hamming") < 0) | (F.col("hamming") > 3)).count() == 0


def test_knn_blocked_exactly_k_per_query(spark):
    per_q = _q(spark, "q_knn_blocked").groupBy("q_id").agg(F.count(F.lit(1)).alias("k"))
    # every block at sf0.001 has ≥ 4 members, so each query gets exactly 3
    assert per_q.filter(F.col("k") != 3).count() == 0


def test_filter_funnel_is_monotone(spark):
    rows = {r["stage"]: r["n_docs"] for r in _q(spark, "q_filter_funnel").collect()}
    seq = [rows["0_total"], rows["1_lang"], rows["2_length"], rows["3_quality"], rows["4_dedup"]]
    assert all(a >= b for a, b in zip(seq, seq[1:]))
    assert all(v >= 0 for v in seq)
