"""Edge-case semantics for the round-4 behavior family (SURVEY.md §5.2 item 3):
tiny synthetic table snapshots exercise the boundary rules the sf-data parity
suite cannot reach (instant conversions, pair-less baskets, independence)."""

from __future__ import annotations

from datetime import datetime

from etl_housing_spark.plans import all_queries

Q = all_queries()


def _write(df, tmp_path, name):
    df.write.mode("overwrite").parquet(f"{tmp_path}/{name}.parquet")


def _events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    _write(df, tmp_path, "events")


def test_attribution_instant_and_nonconverting(spark, tmp_path):
    t = datetime(2024, 1, 1, 12, 0, 0)
    t2 = datetime(2024, 1, 1, 13, 0, 0)
    _events(
        spark,
        tmp_path,
        [
            # user 1 converts on their very first event → '(direct)', 0 steps
            (1, t, 1, "purchase"),
            (2, t2, 1, "view"),
            # user 2 never purchases → excluded from the report
            (3, t, 2, "view"),
            (4, t2, 2, "click"),
        ],
    )
    out = Q["q_attribution_touch"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    row = out[0]
    assert (row.first_touch, row.last_touch) == ("purchase", "(direct)")
    assert row.n_users == 1 and row.avg_steps == 0.0 and row.avg_secs == 0.0


def test_rolling_actives_single_day_covers_following_window_ends(spark, tmp_path):
    t = datetime(2024, 1, 1, 12, 0, 0)
    _events(spark, tmp_path, [(1, t, 7, "view")])
    out = {r.d.day: (r.dau, r.wau7) for r in
           Q["q_rolling_active_users"].fn(spark, str(tmp_path)).collect()}
    # only observed days are reported: one activity day → one report row,
    # where the user is both the DAU and the trailing-7 WAU
    assert out == {1: (1, 1)}


def test_copurchase_singleton_baskets_make_no_pairs(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "l_orderkey long, l_partkey long"
    )
    _write(df, tmp_path, "lineitem")
    assert Q["q_copurchase_lift"].fn(spark, str(tmp_path)).count() == 0


def test_copurchase_lift_above_one_for_always_together(spark, tmp_path):
    # parts 10 and 20 co-occur in all 3 of 4 orders they appear in
    rows = [(o, p) for o in (1, 2, 3) for p in (10, 20)] + [(4, 30)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    _write(df, tmp_path, "lineitem")
    out = Q["q_copurchase_lift"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    # support 3, each item in 3 of 4 baskets: lift = 3*4/(3*3)
    assert (r.p1, r.p2, r.pair_n) == (10, 20, 3)
    # lift is reported rounded to 6dp
    assert abs(r.lift - 4.0 / 3.0) < 1e-6 and r.cosine == 1.0 and r.jaccard == 1.0


def test_weighted_median_discrete_rule_takes_lower_value_on_tie(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 1, 1.0, 10.0, "A"), (2, 1, 1.0, 20.0, "A")],
        "l_orderkey long, l_partkey long, l_quantity double, "
        "l_extendedprice double, l_returnflag string",
    )
    _write(df, tmp_path, "lineitem")
    row = Q["q_weighted_median"].fn(spark, str(tmp_path)).collect()[0]
    # 2*cum == tot exactly at the first value → discrete rule picks it
    assert row.wmedian_price == 10.0 and row.total_qty == 2.0


def test_vocab_growth_skips_single_token_docs(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, "one", "en", "s"), (1, "a b a b", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    _write(df, tmp_path, "documents")
    out = {r.doc_id: (r.cum_bigrams, r.cum_vocab) for r in
           Q["q_vocab_growth"].fn(spark, str(tmp_path)).collect()}
    # doc 0 has no bigram → not on the curve; doc 1: pairs (a b, b a, a b)
    assert out == {1: (3, 2)}


def test_mutual_information_zero_under_independence(spark, tmp_path):
    rows = [
        (i * 4 + j, "t", lang, src)
        for i, lang in enumerate(["en", "fr"])
        for j, src in enumerate(["s1", "s2"])
        for _ in range(5)
    ]
    df = spark.createDataFrame(
        [(k, t, la, so) for (k, t, la, so) in rows],
        "doc_id long, text string, lang string, source string",
    )
    _write(df, tmp_path, "documents")
    row = Q["q_mutual_information"].fn(spark, str(tmp_path)).collect()[0]
    # uniform grid: p(lang, src) == p(lang)p(src) → every ln term is 0
    assert row.mi_nats == 0.0 and row.nmi == 0.0
    assert row.h_lang > 0.0 and row.h_source > 0.0


def test_stream_sessionize_single_event_user_emits_nothing(spark, tmp_path):
    # one event → the session stays open in state; closed-session output is
    # empty, matching the oracle (batch sessions minus each user's last)
    t = datetime(2024, 1, 1, 12, 0, 0)
    _events(spark, tmp_path, [(1, t, 7, "view")])
    assert Q["q_stream_sessionize"].fn(spark, str(tmp_path)).count() == 0


def test_rfm_single_user_lands_in_the_all_ones_segment(spark, tmp_path):
    t = datetime(2024, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [(1, t, 7, "view", 10.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    _write(df, tmp_path, "events")
    out = Q["q_rfm_segments"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.segment == "1-1-1" and r.n_users == 1
    assert r.avg_recency_days == 0.0 and r.avg_frequency == 1.0 and r.avg_monetary == 10.0


def test_benford_digit_comes_from_floor_not_rounding(spark, tmp_path):
    # 999.99 must land on digit 9 (floor -> 999), never digit 1 (round ->
    # 1000) — pins the truncate-vs-round cross-engine divergence the query
    # exists to avoid
    df = spark.createDataFrame(
        [(1, 999.99), (2, 100.0)], "o_orderkey long, o_totalprice double"
    )
    _write(df, tmp_path, "orders")
    out = {r.digit: r.n for r in Q["q_benford"].fn(spark, str(tmp_path)).collect()}
    assert out == {9: 1, 1: 1}


def test_cart_abandonment_window_is_inclusive_at_one_hour(spark, tmp_path):
    from datetime import timedelta

    t = datetime(2024, 1, 1, 12, 0, 0)
    _events(
        spark,
        tmp_path,
        [
            # click converted exactly at +1h (inclusive bound) → NOT abandoned
            (1, t, 1, "click"),
            (2, t + timedelta(hours=1), 1, "purchase"),
            # click whose purchase lands 1s past the window → abandoned
            (3, t, 2, "click"),
            (4, t + timedelta(hours=1, seconds=1), 2, "purchase"),
        ],
    )
    out = [r.click_id for r in Q["q_cart_abandonment"].fn(spark, str(tmp_path)).collect()]
    assert out == [3]


def test_snapshot_diff_dispositions(spark, tmp_path):
    # key 199 deleted in v2, key 100 changed, key 1 untouched
    df = spark.createDataFrame(
        [(1, "P1", 10.0), (100, "P1", 20.0), (199, "P1", 30.0)],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    _write(df, tmp_path, "orders")
    out = {r.disposition: r.n for r in Q["q_snapshot_diff"].fn(spark, str(tmp_path)).collect()}
    assert out == {"unchanged": 1, "changed": 1, "removed": 1}


def test_k_anonymity_flags_small_classes(spark, tmp_path):
    cust = spark.createDataFrame(
        [(i, f"c{i}", 0, 100.0 * i, "BUILDING") for i in range(6)]
        + [(10, "c10", 1, 0.0, "AUTO")],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double, "
        "c_mktsegment string",
    )
    nat = spark.createDataFrame(
        [(0, "A", 0), (1, "B", 0)], "n_nationkey long, n_name string, n_regionkey long"
    )
    _write(cust, tmp_path, "customer")
    _write(nat, tmp_path, "nation")
    out = {(r.seg, r.nation): (r.class_size, r.below_k)
           for r in Q["q_k_anonymity"].fn(spark, str(tmp_path)).collect()}
    assert out == {("BUILDING", "A"): (6, False), ("AUTO", "B"): (1, True)}


def test_odds_ratio_is_one_on_balanced_table(spark, tmp_path):
    # perfectly balanced 2x2 → OR exactly 1, CI brackets 1 symmetrically
    rows = []
    k = 0
    for promo in (True, False):
        for returned in (True, False):
            for _ in range(10):
                rows.append((k, 100 + k, 1.0, 10.0, "R" if returned else "N"))
                k += 1
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_quantity double, "
        "l_extendedprice double, l_returnflag string",
    )
    part = spark.createDataFrame(
        [(100 + i, "PROMO X" if i < 20 else "STANDARD Y") for i in range(40)],
        "p_partkey long, p_type string",
    )
    _write(li, tmp_path, "lineitem")
    _write(part, tmp_path, "part")
    r = Q["q_odds_ratio"].fn(spark, str(tmp_path)).collect()[0]
    assert r.odds_ratio == 1.0
    assert r.ci_low < 1.0 < r.ci_high


def test_seasonal_anomaly_skips_zero_variance_cells(spark, tmp_path):
    # all events in one (dow, hr) cell with identical values → var 0 →
    # the cell is excluded, no division-by-zero rows leak out
    t = datetime(2024, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [(i, t, i, "view", 5.0) for i in range(10)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    _write(df, tmp_path, "events")
    assert Q["q_seasonal_anomaly"].fn(spark, str(tmp_path)).count() == 0


def test_drawdown_peak_to_trough_value(spark, tmp_path):
    # values +10, -5, +3: cum series 10, 5, 8 → peak 10, trough 5 →
    # max drawdown must be 5 (the round-4 cum-ordered-window bug made this 0)
    from datetime import timedelta

    t = datetime(2024, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [
            (1, t, 7, "view", 10.0),
            (2, t + timedelta(minutes=1), 7, "view", -5.0),
            (3, t + timedelta(minutes=2), 7, "view", 3.0),
            # user 8: monotone rising series → drawdown exactly 0
            (4, t, 8, "view", 1.0),
            (5, t + timedelta(minutes=1), 8, "view", 2.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    _write(df, tmp_path, "events")
    out = {r.user_id: r.max_drawdown for r in
           Q["q_drawdown"].fn(spark, str(tmp_path)).collect()}
    assert out == {7: 5.0, 8: 0.0}


def test_ndcg_ideal_depth_uses_corpus_relevant_count(spark, tmp_path):
    # 15 corpus docs share the query's label but the ranking retrieves only
    # 2 of them inside the top 10 (contiguously at ranks 1-2). With the
    # round-4 bug (IDCG depth = retrieved relevant count) nDCG would be 1.0;
    # the corpus-aware ideal depth min(15, 10) must yield < 1.
    rows = [(0, [1.0] * 64, 0)]  # the query vector, label 0
    # 15 relevant (label 0) docs; only 2 get high scores
    for i in range(1, 16):
        v = [1.0] * 64 if i <= 2 else [0.01] * 64
        rows.append((i, v, 0))
    # 20 irrelevant docs with mid scores so they occupy ranks 3..10
    for i in range(16, 36):
        rows.append((i, [0.5] * 64, 1))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    _write(df, tmp_path, "embeddings")
    r = Q["q_ndcg"].fn(spark, str(tmp_path)).collect()[0]
    assert r.n_rel == 2
    # DCG = 1/log2(2) + 1/log2(3); IDCG = sum_{i=1..10} 1/log2(i+1)
    import math

    dcg = 1.0 + 1.0 / math.log2(3)
    idcg = sum(1.0 / math.log2(i + 1) for i in range(1, 11))
    assert abs(r.ndcg_at_10 - round(dcg / idcg, 6)) < 1e-6
    assert r.ndcg_at_10 < 1.0


def test_session_stats_single_event_sessions_have_zero_duration(spark, tmp_path):
    t = datetime(2024, 1, 1, 12, 0, 0)
    _events(spark, tmp_path, [(1, t, 7, "view"), (2, t, 8, "view")])
    r = Q["q_session_stats"].fn(spark, str(tmp_path)).collect()[0]
    assert r.n_sessions == 2
    assert r.mean_dur_s == 0.0 and r.median_dur_s == 0.0 and r.p90_dur_s == 0.0
