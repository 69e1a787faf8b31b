"""Behavioral & corpus-growth analytics (round 4): basket affinity, journey
attribution, rolling engagement, vocabulary growth, weighted quantiles,
categorical association, running extrema, segmentation, survival, windowed
anti-joins, privacy audits, causal readouts, and cohort economics.

Reference parity: the reference's analysis surface is pandas group/merge
reporting over the scraped listings (trulia_csv_to_nlp.ipynb cells 6-36,
advanced.ipynb cells 10-30) — "which features co-occur", "how does a
listing's history unfold", "how is the corpus distributed". These queries
generalize that surface to the shapes an activity warehouse and a
pretraining-corpus pipeline actually run: co-purchase lift over baskets,
first/last-touch conversion attribution, trailing-7-day active users, a
Heaps-law bigram-vocabulary growth curve, a weighted median, mutual
information between categorical columns, max drawdown, RFM quintile
segments, the user-lifetime survival curve, time-windowed cart
abandonment, a k-anonymity/l-diversity release audit, a
difference-in-differences estimator, and the cohort LTV curve.

Scale notes (100 TB story, per query):
- co-purchase: the self-join is keyed on the basket id with bounded per-basket
  fan-out (C(k,2) pairs for a k-line order; k is Poisson-distributed), so the
  pair stream is linear in input, never all-pairs across the catalog.
- attribution: one row_number window + two grouped aggregates, all
  partitioned by user_id — a single shuffle key reused end-to-end.
- rolling actives: the distinct-users-in-trailing-window is rewritten as a
  bounded 7-way day-offset explode of the (day, user) frame + one distinct —
  the linear rewrite of a COUNT(DISTINCT) OVER RANGE that engines either
  reject or recompute per-frame.
- vocab growth: token-pair first-occurrence is one grouped MIN; the cumulative
  curve is a prefix sum over the |docs|-row per-doc aggregate (at corpus
  scale you bucket doc_ids first; the aggregates stay linear).
- weighted median: per-value weight histogram with DECIMAL weights so the
  cumulative window sum is exact and order-independent on both engines.
- mutual information: contingency counts are one scan; everything downstream
  operates on the |langs|x|sources| cell grid (localCheckpointed so the
  corpus is scanned exactly once).

Cross-engine determinism: every float is derived from BIGINT/DECIMAL exact
quantities through identical operand-by-operand arithmetic (see _util), ratio
windows order on unique keys, and log/sqrt terms are summed via the
decimal-exact ``dsum``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators._ckpt import single_shot_checkpoint
from ._util import DEC, dsum, sql_dsum
from .registry import query

# Minimum orders containing a part pair before it enters the affinity report
# (rare pairs are noise: lift on a support-1 pair is meaningless).
_MIN_PAIR_SUPPORT = 3


@query(
    "q_copurchase_lift",
    # Market-basket affinity: which part pairs co-occur in orders more than
    # chance predicts. The self-join is on l_orderkey (bounded fan-out per
    # order), NOT across the part catalog — pair candidates are linear in
    # lineitem. lift/cosine/jaccard all derive from BIGINT supports through
    # identical double arithmetic on both engines.
    oracle=f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    item AS (SELECT l_partkey, COUNT(*) AS n FROM b GROUP BY l_partkey),
    tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM b),
    pairs AS (
      SELECT a.l_partkey AS p1, c.l_partkey AS p2, COUNT(*) AS pair_n
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_MIN_PAIR_SUPPORT})
    SELECT p1, p2, pair_n,
           ROUND(pair_n * n_orders / CAST(i1.n * i2.n AS DOUBLE), 6) AS lift,
           ROUND(pair_n / sqrt(CAST(i1.n * i2.n AS DOUBLE)), 6) AS cosine,
           ROUND(pair_n / CAST(i1.n + i2.n - pair_n AS DOUBLE), 6) AS jaccard
    FROM pairs
    JOIN item i1 ON p1 = i1.l_partkey
    JOIN item i2 ON p2 = i2.l_partkey
    CROSS JOIN tot
    """,
    description="market-basket co-purchase affinity (support/lift/cosine/"
    "jaccard) over order baskets: distinct (order, part) frame, self-join on "
    "the order key with p1<p2 canonicalization — per-order C(k,2) fan-out, "
    "linear in lineitem, never catalog x catalog — grouped pair supports, two "
    "shuffled joins back to per-item supports, broadcast scalar order count",
    tags=("behavior", "join"),
)
def q_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select("l_orderkey", "l_partkey").distinct()
    item = b.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    tot = b.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    a, c = b.alias("a"), b.alias("c")
    pairs = (
        a.join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("c.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("c.l_partkey").alias("p2")
        )
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= _MIN_PAIR_SUPPORT)
    )
    i1 = item.select(F.col("l_partkey").alias("p1"), F.col("n").alias("n1"))
    i2 = item.select(F.col("l_partkey").alias("p2"), F.col("n").alias("n2"))
    return (
        pairs.join(i1, "p1")
        .join(i2, "p2")
        .crossJoin(F.broadcast(tot))
        .select(
            "p1",
            "p2",
            "pair_n",
            F.round(
                (F.col("pair_n") * F.col("n_orders"))
                / (F.col("n1") * F.col("n2")).cast("double"),
                6,
            ).alias("lift"),
            F.round(
                F.col("pair_n") / F.sqrt((F.col("n1") * F.col("n2")).cast("double")),
                6,
            ).alias("cosine"),
            F.round(
                F.col("pair_n")
                / (F.col("n1") + F.col("n2") - F.col("pair_n")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


@query(
    "q_attribution_touch",
    # Conversion attribution: for every user whose journey contains a
    # purchase, the channel that opened the journey (first touch) and the
    # one immediately before conversion (last touch), rolled up into the
    # (first, last) attribution report. One row_number window and two
    # aggregates, all on user_id — the shuffle key is reused end-to-end.
    oracle=f"""
    WITH r AS (
      SELECT user_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
    conv AS (
      SELECT user_id, MIN(rn) AS conv_rn
      FROM r WHERE event_type = 'purchase' GROUP BY user_id),
    per AS (
      SELECT r.user_id,
             MIN(CASE WHEN rn = 1 THEN event_type END) AS first_touch,
             COALESCE(MIN(CASE WHEN rn = conv_rn - 1 THEN event_type END),
                      '(direct)') AS last_touch,
             MIN(conv_rn) - 1 AS steps,
             (MIN(CASE WHEN rn = conv_rn THEN epoch_us(ts) END)
              - MIN(CASE WHEN rn = 1 THEN epoch_us(ts) END)) / 1000000.0 AS secs
      FROM r JOIN conv ON r.user_id = conv.user_id
      GROUP BY r.user_id)
    SELECT first_touch, last_touch,
           COUNT(*) AS n_users,
           ROUND({sql_dsum('steps')} / COUNT(*), 6) AS avg_steps,
           ROUND({sql_dsum('secs')} / COUNT(*), 6) AS avg_secs
    FROM per GROUP BY first_touch, last_touch
    """,
    description="first/last-touch conversion attribution over user journeys: "
    "row_number per user on (ts, event_id), earliest purchase row per user, "
    "conditional aggregation pulls first touch / pre-conversion touch / "
    "steps-and-seconds-to-convert in one grouped pass, rolled up to the "
    "(first_touch, last_touch) report — one window + two aggregates, single "
    "shuffle key (user_id) throughout",
    tags=("behavior", "window"),
)
def q_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.row_number().over(w).alias("rn"),
    )
    conv = (
        r.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("conv_rn"))
    )
    per = (
        r.join(conv, "user_id")
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("event_type"))).alias("first_touch"),
            F.coalesce(
                F.min(
                    F.when(F.col("rn") == F.col("conv_rn") - 1, F.col("event_type"))
                ),
                F.lit("(direct)"),
            ).alias("last_touch"),
            (F.min("conv_rn") - 1).alias("steps"),
            (
                (
                    F.min(F.when(F.col("rn") == F.col("conv_rn"), F.col("us")))
                    - F.min(F.when(F.col("rn") == 1, F.col("us")))
                )
                / 1000000.0
            ).alias("secs"),
        )
    )
    return per.groupBy("first_touch", "last_touch").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(dsum("steps") / F.count(F.lit(1)), 6).alias("avg_steps"),
        F.round(dsum("secs") / F.count(F.lit(1)), 6).alias("avg_secs"),
    )


@query(
    "q_rolling_active_users",
    # Trailing-7-day distinct actives (WAU) + same-day actives (DAU) +
    # stickiness. COUNT(DISTINCT) OVER a RANGE frame is either unsupported
    # or O(days x window) re-scanned; the linear rewrite: each (day, user)
    # activity row covers the 7 window-end days d..d+6, so explode a bounded
    # 0..6 offset, dedup (window_end, user), count. Shuffles touch the
    # (day, user) frame — already collapsed from raw events — never 7x the
    # event table.
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
      FROM events),
    days AS (SELECT DISTINCT d FROM du),
    grid AS (
      SELECT du.d + CAST(g.k AS INTEGER) AS wd, du.user_id
      FROM du, (SELECT unnest(generate_series(0, 6)) AS k) g),
    wau AS (
      SELECT wd, COUNT(*) AS wau7 FROM (
        SELECT DISTINCT grid.wd, grid.user_id
        FROM grid JOIN days ON grid.wd = days.d)
      GROUP BY wd),
    dau AS (SELECT d, COUNT(*) AS dau FROM du GROUP BY d)
    SELECT CAST(dau.d AS TIMESTAMP) AS d, dau.dau, wau.wau7,
           ROUND(dau.dau / CAST(wau.wau7 AS DOUBLE), 6) AS stickiness
    FROM dau JOIN wau ON dau.d = wau.wd
    """,
    description="DAU / trailing-7-day WAU / stickiness via the bounded "
    "day-offset explode rewrite of COUNT(DISTINCT) OVER RANGE: distinct "
    "(day, user) frame, 7-way offset explode to every window-end it covers, "
    "semi-join to observed days, dedup + count — linear in activity rows, no "
    "per-frame distinct recomputation",
    tags=("behavior", "timeseries", "window"),
)
def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("d"), "user_id"
    ).distinct()
    days = du.select("d").distinct().withColumnRenamed("d", "wd")
    grid = du.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"), "d", "user_id"
    ).select(F.date_add("d", F.col("k")).alias("wd"), "user_id")
    wau = (
        grid.join(days, "wd")
        .select("wd", "user_id")
        .distinct()
        .groupBy("wd")
        .agg(F.count(F.lit(1)).alias("wau7"))
    )
    dau = du.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    return (
        dau.join(wau, dau.d == wau.wd)
        .select(
            F.col("d").cast("timestamp_ntz").alias("d"),
            "dau",
            "wau7",
            F.round(F.col("dau") / F.col("wau7").cast("double"), 6).alias(
                "stickiness"
            ),
        )
    )


@query(
    "q_vocab_growth",
    # Heaps-law vocabulary growth over the corpus in doc_id order: cumulative
    # token-pair (bigram) volume vs cumulative distinct bigrams first seen.
    # First-occurrence is one grouped MIN over the bigram stream; the curve
    # is a prefix sum over the |docs|-row per-doc aggregate (bucket doc_ids
    # before the window at corpus scale — the aggregates stay linear).
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    bi AS (
      SELECT doc_id, p[1] || ' ' || p[2] AS bg
      FROM (SELECT doc_id, unnest(list_zip(t, t[2:])) AS p FROM toks)
      WHERE p[2] IS NOT NULL),
    per_doc AS (SELECT doc_id, COUNT(*) AS n_bi FROM bi GROUP BY doc_id),
    firsts AS (SELECT bg, MIN(doc_id) AS fd FROM bi GROUP BY bg),
    newv AS (SELECT fd, COUNT(*) AS new_v FROM firsts GROUP BY fd)
    SELECT p.doc_id,
           CAST(SUM(p.n_bi) OVER w AS BIGINT) AS cum_bigrams,
           CAST(SUM(COALESCE(n.new_v, 0)) OVER w AS BIGINT) AS cum_vocab,
           ROUND(CAST(SUM(COALESCE(n.new_v, 0)) OVER w AS BIGINT)
                 / CAST(SUM(p.n_bi) OVER w AS DOUBLE), 6) AS ttr
    FROM per_doc p LEFT JOIN newv n ON p.doc_id = n.fd
    WINDOW w AS (ORDER BY p.doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    description="Heaps-law bigram vocabulary growth curve: adjacent-pair "
    "stream from one explode scan, per-doc pair counts + first-occurrence "
    "doc per bigram (grouped MIN), prefix sums over the per-doc aggregate "
    "give cumulative volume / cumulative vocabulary / type-token ratio — the "
    "corpus-saturation diagnostic for dedup and mixture decisions",
    tags=("behavior", "text", "window"),
)
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    bi = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.expr(
                    "transform(sequence(0, size(t) - 2),"
                    " i -> concat(t[i], ' ', t[i + 1]))"
                ),
            ).otherwise(F.expr("array()").cast("array<string>"))
        ).alias("bg"),
    )
    per_doc = bi.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_bi"))
    firsts = bi.groupBy("bg").agg(F.min("doc_id").alias("fd"))
    newv = firsts.groupBy("fd").agg(F.count(F.lit(1)).alias("new_v"))
    base = per_doc.join(
        newv, per_doc.doc_id == newv.fd, "left"
    ).select("doc_id", "n_bi", F.coalesce("new_v", F.lit(0)).alias("new_v"))
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    cum_bi = F.sum("n_bi").over(w).cast("long")
    cum_v = F.sum("new_v").over(w).cast("long")
    return base.select(
        "doc_id",
        cum_bi.alias("cum_bigrams"),
        cum_v.alias("cum_vocab"),
        F.round(cum_v / cum_bi.cast("double"), 6).alias("ttr"),
    )


@query(
    "q_weighted_median",
    # Weighted median price per return flag, quantity-weighted: per-value
    # DECIMAL weight histogram (exact, order-free), cumulative weight window
    # in DECIMAL (no float accumulation anywhere), discrete rule
    # 2*cum >= total. The weighted analog of q_mode_median's histogram
    # construction — one scan, one shuffle on (flag, value), window on the
    # collapsed histogram only.
    oracle="""
    WITH h AS (
      SELECT l_returnflag AS flag, l_extendedprice AS v,
             SUM(CAST(l_quantity AS DECIMAL(18,6))) AS wt
      FROM lineitem GROUP BY 1, 2),
    w AS (
      SELECT flag, v, wt,
             SUM(wt) OVER (PARTITION BY flag ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(wt) OVER (PARTITION BY flag) AS tot
      FROM h)
    SELECT flag,
           MIN(CASE WHEN 2 * cum >= tot THEN v END) AS wmedian_price,
           CAST(MIN(tot) AS DOUBLE) AS total_qty
    FROM w GROUP BY flag
    """,
    description="quantity-weighted median price per return flag: per-value "
    "decimal weight histogram, exact cumulative-weight window over the "
    "collapsed histogram, discrete 2*cum >= tot rule — no float accumulation "
    "anywhere, so both engines agree bit-for-bit; the weighted-quantile "
    "primitive for corpus mixing and skew reporting",
    tags=("behavior", "stats"),
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    h = li.groupBy(
        F.col("l_returnflag").alias("flag"), F.col("l_extendedprice").alias("v")
    ).agg(F.sum(F.col("l_quantity").cast(DEC)).alias("wt"))
    w_cum = (
        Window.partitionBy("flag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("flag")
    wf = h.select(
        "flag",
        "v",
        F.sum("wt").over(w_cum).alias("cum"),
        F.sum("wt").over(w_all).alias("tot"),
    )
    return wf.groupBy("flag").agg(
        F.min(F.when(2 * F.col("cum") >= F.col("tot"), F.col("v"))).alias(
            "wmedian_price"
        ),
        F.min("tot").cast("double").alias("total_qty"),
    )


@query(
    "q_mutual_information",
    # Mutual information (and normalized MI) between the lang and source
    # columns — "does source predict language?", the categorical-association
    # audit run before stratifying a corpus mix. Contingency counts are one
    # scan (localCheckpointed: marginals, totals, and the term grid all
    # derive from the |langs|x|sources| cell frame, not from re-scans); every
    # float comes from BIGINT counts through identical arithmetic; ln terms
    # sum decimal-exact.
    oracle=f"""
    WITH c AS (
      SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY lang, source),
    l AS (SELECT lang, SUM(n) AS nl FROM c GROUP BY lang),
    s AS (SELECT source, SUM(n) AS ns FROM c GROUP BY source),
    t AS (SELECT SUM(n) AS nt FROM c),
    mi AS (
      SELECT {sql_dsum("(n / CAST(nt AS DOUBLE)) * ln((n * nt) / CAST(nl * ns AS DOUBLE))")} AS mi
      FROM c JOIN l ON c.lang = l.lang JOIN s ON c.source = s.source CROSS JOIN t),
    hl AS (
      SELECT {sql_dsum("-(nl / CAST(nt AS DOUBLE)) * ln(nl / CAST(nt AS DOUBLE))")} AS h_lang
      FROM l CROSS JOIN t),
    hs AS (
      SELECT {sql_dsum("-(ns / CAST(nt AS DOUBLE)) * ln(ns / CAST(nt AS DOUBLE))")} AS h_source
      FROM s CROSS JOIN t)
    SELECT ROUND(mi, 6) AS mi_nats,
           ROUND(h_lang, 6) AS h_lang,
           ROUND(h_source, 6) AS h_source,
           ROUND(mi / sqrt(h_lang * h_source), 6) AS nmi
    FROM mi CROSS JOIN hl CROSS JOIN hs
    """,
    description="mutual information + entropies + normalized MI between lang "
    "and source: one contingency-count scan (localCheckpointed cell grid), "
    "marginals and totals derived from the grid, per-cell ln terms summed "
    "decimal-exact, NMI = MI / sqrt(H_lang * H_source) — the categorical "
    "association audit before corpus stratification",
    tags=("behavior", "stats"),
)
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = single_shot_checkpoint(
        docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    )
    l_m = c.groupBy("lang").agg(F.sum("n").alias("nl"))
    s_m = c.groupBy("source").agg(F.sum("n").alias("ns"))
    t = c.agg(F.sum("n").alias("nt"))
    grid = (
        c.join(l_m, "lang").join(s_m, "source").crossJoin(F.broadcast(t))
    )
    mi_term = (F.col("n") / F.col("nt").cast("double")) * F.log(
        (F.col("n") * F.col("nt")) / (F.col("nl") * F.col("ns")).cast("double")
    )
    mi = grid.agg(dsum(mi_term).alias("mi"))
    pl = F.col("nl") / F.col("nt").cast("double")
    hl = l_m.crossJoin(F.broadcast(t)).agg(dsum(-pl * F.log(pl)).alias("h_lang"))
    ps = F.col("ns") / F.col("nt").cast("double")
    hs = s_m.crossJoin(F.broadcast(t)).agg(
        dsum(-ps * F.log(ps)).alias("h_source")
    )
    return (
        mi.crossJoin(F.broadcast(hl))
        .crossJoin(F.broadcast(hs))
        .select(
            F.round("mi", 6).alias("mi_nats"),
            F.round("h_lang", 6).alias("h_lang"),
            F.round("h_source", 6).alias("h_source"),
            F.round(
                F.col("mi") / F.sqrt(F.col("h_lang") * F.col("h_source")), 6
            ).alias("nmi"),
        )
    )


@query(
    "q_drawdown",
    # Maximum drawdown of each user's cumulative value series — the
    # running-extremum window primitive (peak-to-trough distance) the
    # window family was missing. Every intermediate is DECIMAL: cumulative
    # sum, running max, and their difference are exact and order-free, so
    # both engines agree bit-for-bit; one shuffle on user_id, one sort,
    # all three frames evaluate in a single WindowExec pass.
    oracle="""
    WITH c AS (
      SELECT user_id, ts, event_id,
             SUM(CAST(value AS DECIMAL(18,6))) OVER w AS cum
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    d AS (
      SELECT user_id,
             MAX(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - cum AS dd
      FROM c)
    SELECT user_id, CAST(MAX(dd) AS DOUBLE) AS max_drawdown
    FROM d GROUP BY user_id
    """,
    description="maximum drawdown per user over the cumulative event-value "
    "series: decimal-exact cumulative sum, running max, peak-to-trough "
    "difference, grouped max — the running-extremum window primitive "
    "(regression/alerting on any monotone-expected metric); one shuffle on "
    "the entity key, zero float accumulation",
    tags=("behavior", "window", "timeseries"),
)
def q_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(F.col("value").cast(DEC)).over(w).alias("cum"),
    )
    # running max MUST be ordered by event time (not by cum): ordering by
    # cum would make the running max equal the current cum everywhere and
    # dd identically 0 — caught by round-4 advisor review
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = c.select("user_id", (F.max("cum").over(w2) - F.col("cum")).alias("dd"))
    return d.groupBy("user_id").agg(
        F.max("dd").cast("double").alias("max_drawdown")
    )


@query(
    "q_rfm_segments",
    # RFM (recency / frequency / monetary) segmentation — the classic
    # customer-value report. Per-user metrics are one grouped aggregate;
    # quintile assignment is NTILE over the (metric, user_id) total order
    # (deterministic under ties, SQL-standard remainder rule on both
    # engines); the windows run on the |users|-row aggregate, not the event
    # table. At 1B users the global NTILE sorts become the q_corpus_mix
    # situation: switch to histogram-rank bucketing; the report shape is
    # unchanged. Monetary sums are decimal-exact, so the quintile ORDER BY
    # doubles are identical on both engines.
    oracle=f"""
    WITH g AS (SELECT CAST(MAX(ts) AS DATE) AS gday FROM events),
    per AS (
      SELECT user_id,
             date_diff('day', CAST(MAX(ts) AS DATE), g.gday) AS rec_days,
             COUNT(*) AS f,
             {sql_dsum('value')} AS m
      FROM events CROSS JOIN g GROUP BY user_id, g.gday),
    b AS (
      SELECT user_id, rec_days, f, m,
             NTILE(5) OVER (ORDER BY rec_days ASC, user_id) AS r_b,
             NTILE(5) OVER (ORDER BY f DESC, user_id) AS f_b,
             NTILE(5) OVER (ORDER BY m DESC, user_id) AS m_b
      FROM per)
    SELECT CAST(r_b AS VARCHAR) || '-' || CAST(f_b AS VARCHAR) || '-'
             || CAST(m_b AS VARCHAR) AS segment,
           COUNT(*) AS n_users,
           ROUND({sql_dsum('rec_days')} / COUNT(*), 6) AS avg_recency_days,
           ROUND({sql_dsum('f')} / COUNT(*), 6) AS avg_frequency,
           ROUND({sql_dsum('m')} / COUNT(*), 6) AS avg_monetary
    FROM b GROUP BY segment
    """,
    description="RFM quintile segmentation: per-user recency/frequency/"
    "monetary from one grouped aggregate (decimal-exact value sums), "
    "deterministic NTILE(5) per dimension over the (metric, user_id) order "
    "on the collapsed per-user frame, rolled up per segment — bucket 1 is "
    "best on every axis; the customer-value report every activity warehouse "
    "ships, with histogram-rank bucketing as the 1B-user scale path",
    tags=("behavior", "stats", "window"),
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    g = ev.agg(F.max("ts").cast("date").alias("gday"))
    per = (
        ev.crossJoin(F.broadcast(g))
        .groupBy("user_id", "gday")
        .agg(
            F.max("ts").cast("date").alias("last_day"),
            F.count(F.lit(1)).alias("f"),
            dsum("value").alias("m"),
        )
        .select(
            "user_id",
            F.datediff("gday", "last_day").alias("rec_days"),
            "f",
            "m",
        )
    )
    b = per.select(
        "user_id",
        "rec_days",
        "f",
        "m",
        F.ntile(5).over(Window.orderBy(F.asc("rec_days"), "user_id")).alias("r_b"),
        F.ntile(5).over(Window.orderBy(F.desc("f"), "user_id")).alias("f_b"),
        F.ntile(5).over(Window.orderBy(F.desc("m"), "user_id")).alias("m_b"),
    )
    seg = F.concat_ws(
        "-",
        F.col("r_b").cast("string"),
        F.col("f_b").cast("string"),
        F.col("m_b").cast("string"),
    )
    return b.groupBy(seg.alias("segment")).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(dsum("rec_days") / F.count(F.lit(1)), 6).alias("avg_recency_days"),
        F.round(dsum("f") / F.count(F.lit(1)), 6).alias("avg_frequency"),
        F.round(dsum("m") / F.count(F.lit(1)), 6).alias("avg_monetary"),
    )


@query(
    "q_survival_curve",
    # User-lifetime survival curve (the Kaplan-Meier-shaped retention view
    # without censoring — every user's span is fully observed in the
    # window): lifespan = days between first and last activity, collapsed
    # to a lifespan histogram, then a DESCENDING prefix sum gives "users
    # surviving >= k days". All integers until one final division of
    # identical bigints; the suffix-sum window runs on the |distinct
    # lifespans|-row histogram, never the event table.
    oracle="""
    WITH per AS (
      SELECT user_id,
             date_diff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE))
               AS lifespan
      FROM events GROUP BY user_id),
    h AS (SELECT lifespan, COUNT(*) AS n FROM per GROUP BY lifespan),
    t AS (SELECT SUM(n) AS total FROM h)
    SELECT h.lifespan AS days, h.n AS n_ending,
           CAST(SUM(h.n) OVER (ORDER BY h.lifespan DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_surviving,
           ROUND(CAST(SUM(h.n) OVER (ORDER BY h.lifespan DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                / CAST(t.total AS DOUBLE), 6) AS surv_frac
    FROM h CROSS JOIN t
    """,
    description="user-lifetime survival curve: per-user activity span in days "
    "(one grouped aggregate), lifespan histogram, descending prefix sum for "
    "'surviving >= k days' + survival fraction — the retention-decay view a "
    "cohort matrix doesn't give directly; integer arithmetic to one final "
    "division, windows on the collapsed histogram only",
    tags=("behavior", "timeseries", "window"),
)
def q_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.datediff(F.max("ts").cast("date"), F.min("ts").cast("date")).alias(
            "lifespan"
        )
    )
    h = per.groupBy("lifespan").agg(F.count(F.lit(1)).alias("n"))
    t = h.agg(F.sum("n").alias("total"))
    w = Window.orderBy(F.desc("lifespan")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    surviving = F.sum("n").over(w).cast("long")
    return (
        h.crossJoin(F.broadcast(t))
        .select(
            F.col("lifespan").alias("days"),
            F.col("n").alias("n_ending"),
            surviving.alias("n_surviving"),
            F.round(surviving / F.col("total").cast("double"), 6).alias(
                "surv_frac"
            ),
        )
    )


@query(
    "q_cart_abandonment",
    # The time-windowed NOT EXISTS: clicks with no same-user purchase in the
    # following hour — the abandonment detector. Spark expresses it as a
    # LEFT ANTI join on the user_id equi-key with the time window as a
    # residual predicate, so the plan stays a hash anti-join (never a
    # nested loop); the per-user match set is bounded by the user's own
    # purchase rate x window.
    oracle="""
    SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts
    FROM events c
    WHERE c.event_type = 'click'
      AND NOT EXISTS (
        SELECT 1 FROM events p
        WHERE p.event_type = 'purchase'
          AND p.user_id = c.user_id
          AND p.ts > c.ts
          AND p.ts <= c.ts + INTERVAL 1 HOUR)
    """,
    description="cart abandonment: clicks with no same-user purchase within "
    "the following hour — the time-windowed NOT EXISTS, expressed as a LEFT "
    "ANTI hash join on user_id with the event-time window as a residual "
    "predicate (no nested loop); the conversion-leak detector every commerce "
    "warehouse runs",
    tags=("behavior", "join", "timeseries"),
)
def q_cart_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    cond = (
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("click_ts"))
        & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    return clicks.join(purchases, cond, "left_anti")


@query(
    "q_k_anonymity",
    # Privacy-release audit: for the quasi-identifier tuple (market segment,
    # nation), the equivalence-class sizes that determine k-anonymity, plus
    # the count of distinct sensitive values (account-balance band) per
    # class — the l-diversity check. Classes below k=5 are the re-
    # identification risk rows a release gate blocks on. Two grouped
    # aggregates on the same key — one shuffle, AQE reuses the exchange.
    oracle="""
    WITH t AS (
      SELECT c_mktsegment AS seg, n.n_name AS nation,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
    cls AS (
      SELECT seg, nation,
             COUNT(*) AS class_size,
             COUNT(DISTINCT bal_band) AS l_diversity
      FROM t GROUP BY seg, nation)
    SELECT seg, nation, class_size, l_diversity,
           class_size < 5 AS below_k
    FROM cls
    """,
    description="k-anonymity / l-diversity audit of the (segment, nation) "
    "quasi-identifier: equivalence-class sizes (k) and distinct sensitive "
    "bands per class (l) from one grouped pass, with the below-k=5 risk "
    "flag — the re-identification gate run before a data release; the "
    "privacy-compliance family's first entry",
    tags=("behavior", "validation"),
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    t = cust.join(
        F.broadcast(nat), cust.c_nationkey == nat.n_nationkey
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("n_name").alias("nation"),
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    )
    cls = t.groupBy("seg", "nation").agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct("bal_band").alias("l_diversity"),
    )
    return cls.select(
        "seg",
        "nation",
        "class_size",
        "l_diversity",
        (F.col("class_size") < 5).alias("below_k"),
    )


@query(
    "q_diff_in_diff",
    # The causal-analysis workhorse: difference-in-differences of event value
    # between a treated and a control user group across a treatment date.
    # Groups and period are deterministic (user parity, day-15 cutoff), the
    # four cell means come from decimal-exact sums divided once, and the DiD
    # estimator is four identical double ops — one grouped scan, a 4-row
    # aggregate, a one-row report.
    oracle=f"""
    WITH c AS (
      SELECT (user_id % 2 = 0) AS treat,
             (ts >= TIMESTAMP '2024-01-16 00:00:00') AS post,
             COUNT(*) AS n, {sql_dsum('value')} AS s
      FROM events GROUP BY 1, 2),
    w AS (
      SELECT MIN(CASE WHEN treat AND post THEN s / n END) AS m_tp,
             MIN(CASE WHEN treat AND NOT post THEN s / n END) AS m_t0,
             MIN(CASE WHEN NOT treat AND post THEN s / n END) AS m_cp,
             MIN(CASE WHEN NOT treat AND NOT post THEN s / n END) AS m_c0
      FROM c)
    SELECT ROUND(m_t0, 6) AS treat_pre, ROUND(m_tp, 6) AS treat_post,
           ROUND(m_c0, 6) AS control_pre, ROUND(m_cp, 6) AS control_post,
           ROUND((m_tp - m_t0) - (m_cp - m_c0), 6) AS did
    FROM w
    """,
    description="difference-in-differences estimator over the event stream: "
    "deterministic treated/control user split x pre/post treatment date, four "
    "decimal-exact cell means from one grouped scan, DiD = (treat-post - "
    "treat-pre) - (control-post - control-pre) — the causal-readout companion "
    "to q_ab_welch's cross-sectional test",
    tags=("behavior", "stats"),
)
def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        (F.col("user_id") % 2 == 0).alias("treat"),
        (F.col("ts") >= F.lit("2024-01-16 00:00:00").cast("timestamp_ntz")).alias(
            "post"
        ),
    ).agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("s"))
    m = F.col("s") / F.col("n")
    w = c.agg(
        F.min(F.when(F.col("treat") & F.col("post"), m)).alias("m_tp"),
        F.min(F.when(F.col("treat") & ~F.col("post"), m)).alias("m_t0"),
        F.min(F.when(~F.col("treat") & F.col("post"), m)).alias("m_cp"),
        F.min(F.when(~F.col("treat") & ~F.col("post"), m)).alias("m_c0"),
    )
    return w.select(
        F.round("m_t0", 6).alias("treat_pre"),
        F.round("m_tp", 6).alias("treat_post"),
        F.round("m_c0", 6).alias("control_pre"),
        F.round("m_cp", 6).alias("control_post"),
        F.round(
            (F.col("m_tp") - F.col("m_t0")) - (F.col("m_cp") - F.col("m_c0")), 6
        ).alias("did"),
    )


@query(
    "q_cohort_ltv",
    # Cohort lifetime-value curve — the revenue companion to
    # q_retention_cohorts' activity matrix: users grouped by signup week
    # (first-seen), their spend bucketed by weeks-since-signup, then a
    # cumulative sum per cohort gives LTV-per-user at each age. Sums are
    # decimal through the cumulative window (exact, order-free); the window
    # runs on the cohorts x horizon matrix, never the event table.
    # floor(epoch(ts)) on the DuckDB side, not CAST(epoch(..) AS BIGINT):
    # Spark's unix_timestamp truncates sub-second fractions where DuckDB's
    # double->int cast rounds — a 1-in-week-seconds boundary divergence per
    # event (same family as q_benford's floor rule).
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(floor(epoch(ts)) AS BIGINT) // 604800) AS cw
      FROM events GROUP BY user_id),
    spend AS (
      SELECT f.cw,
             CAST(floor(epoch(e.ts)) AS BIGINT) // 604800 - f.cw AS age_w,
             SUM(CAST(e.value AS DECIMAL(18,6))) AS rev
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
      GROUP BY 1, 2),
    size_ AS (SELECT cw, COUNT(*) AS n_users FROM first_seen GROUP BY cw)
    SELECT s.cw AS cohort_week, s.age_w, z.n_users,
           CAST(SUM(s.rev) OVER (PARTITION BY s.cw ORDER BY s.age_w
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS cum_revenue,
           ROUND(CAST(SUM(s.rev) OVER (PARTITION BY s.cw ORDER BY s.age_w
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                / z.n_users, 6) AS ltv_per_user
    FROM spend s JOIN size_ z ON s.cw = z.cw
    """,
    description="cohort LTV curve: signup-week cohorts (first-seen epoch "
    "week), spend bucketed by weeks-since-signup, decimal-exact cumulative "
    "revenue per cohort and LTV per user at each age — the monetary "
    "companion to the retention matrix; two grouped aggregates + one window "
    "on the cohorts x horizon frame",
    tags=("behavior", "timeseries", "window"),
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    week = (F.unix_timestamp(F.col("ts").cast("timestamp")) / F.lit(604800)).cast(
        "long"
    )
    ev_w = ev.select("user_id", week.alias("w"), "value")
    first_seen = ev_w.groupBy("user_id").agg(F.min("w").alias("cw"))
    spend = (
        ev_w.join(first_seen, "user_id")
        .groupBy("cw", (F.col("w") - F.col("cw")).alias("age_w"))
        .agg(F.sum(F.col("value").cast(DEC)).alias("rev"))
    )
    size = first_seen.groupBy("cw").agg(F.count(F.lit(1)).alias("n_users"))
    w = (
        Window.partitionBy("cw")
        .orderBy("age_w")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("rev").over(w).cast("double")
    return (
        spend.join(size, "cw")
        .select(
            F.col("cw").alias("cohort_week"),
            "age_w",
            "n_users",
            cum.alias("cum_revenue"),
            F.round(cum / F.col("n_users"), 6).alias("ltv_per_user"),
        )
    )


@query(
    "q_first_vs_repeat",
    # New-vs-repeat buyer economics: is a customer's first order bigger or
    # smaller than their repeats? Order rank per customer from one
    # row_number window (deterministic (date, key) tie-break), then
    # decimal-exact means and counts per cohort — the unit-economics
    # report behind acquisition-vs-retention budget splits. One shuffle on
    # the customer key; the final aggregate is two rows.
    oracle=f"""
    WITH r AS (
      SELECT o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders)
    SELECT CASE WHEN rn = 1 THEN 'first' ELSE 'repeat' END AS order_kind,
           COUNT(*) AS n_orders,
           ROUND({sql_dsum('o_totalprice')} / COUNT(*), 6) AS avg_value,
           ROUND({sql_dsum('o_totalprice')}, 6) AS total_value
    FROM r GROUP BY 1
    """,
    description="first-vs-repeat order economics: order rank per customer "
    "from one row_number window ((date, key) tie-break), decimal-exact "
    "count/avg/total per cohort — the acquisition-vs-retention unit-"
    "economics split; one shuffle on the customer key, two-row report",
    tags=("behavior", "window"),
)
def q_first_vs_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    r = orders.select(
        "o_totalprice", F.row_number().over(w).alias("rn")
    )
    return (
        r.groupBy(
            F.when(F.col("rn") == 1, "first").otherwise("repeat").alias("order_kind")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(dsum("o_totalprice") / F.count(F.lit(1)), 6).alias("avg_value"),
            F.round(dsum("o_totalprice"), 6).alias("total_value"),
        )
    )


@query(
    "q_segment_migration",
    # Customer segment-migration matrix — the CRM "who moved up, who
    # churned" report: customers are spend-quintiled independently in two
    # periods (deterministic NTILE over decimal-exact revenue with custkey
    # tie-break), full-outer-joined on the customer, and the transition
    # counts (including entered/left, bucket 0) form the 6x6 matrix. The
    # quintile windows run on the per-customer aggregates; the matrix is 36
    # rows regardless of volume.
    oracle=f"""
    WITH p1 AS (
      SELECT o_custkey AS ck, {sql_dsum('o_totalprice')} AS r
      FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY o_custkey),
    p2 AS (
      SELECT o_custkey AS ck, {sql_dsum('o_totalprice')} AS r
      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY o_custkey),
    q1 AS (SELECT ck, NTILE(5) OVER (ORDER BY r, ck) AS seg FROM p1),
    q2 AS (SELECT ck, NTILE(5) OVER (ORDER BY r, ck) AS seg FROM p2)
    SELECT COALESCE(q1.seg, 0) AS seg_from,
           COALESCE(q2.seg, 0) AS seg_to,
           COUNT(*) AS n_customers
    FROM q1 FULL JOIN q2 ON q1.ck = q2.ck
    GROUP BY 1, 2
    """,
    description="customer segment-migration matrix: independent spend "
    "quintiles per period (deterministic NTILE over decimal-exact revenue, "
    "custkey tie-break), full outer join on the customer, transition counts "
    "with entered/left as bucket 0 — the CRM movement report; quintile "
    "windows on per-customer aggregates, a 36-row matrix regardless of "
    "volume",
    tags=("behavior", "window", "join"),
)
def q_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")

    def quintiles(df):
        rev = df.groupBy(F.col("o_custkey").alias("ck")).agg(
            dsum("o_totalprice").alias("r")
        )
        return rev.select(
            "ck", F.ntile(5).over(Window.orderBy("r", "ck")).alias("seg")
        )

    q1 = quintiles(orders.where(F.col("o_orderdate") < cut)).withColumnRenamed(
        "seg", "s1"
    )
    q2 = quintiles(orders.where(F.col("o_orderdate") >= cut)).withColumnRenamed(
        "seg", "s2"
    )
    return (
        q1.join(q2, "ck", "full")
        .groupBy(
            F.coalesce("s1", F.lit(0)).alias("seg_from"),
            F.coalesce("s2", F.lit(0)).alias("seg_to"),
        )
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "q_growth_accounting",
    # The growth-accounting identity: today's actives decompose into new
    # (first-ever day), retained (also active yesterday) and resurrected
    # (seen before, not yesterday); churned = yesterday's actives missing
    # today. DAU(t) = new + retained + resurrected and
    # DAU(t) - DAU(t-1) = new + resurrected - churned — the report every
    # growth team reads daily. All integer set logic: distinct (day, user)
    # frame, first-seen join, self-join to the previous day — shuffles touch
    # the activity frame only.
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
      FROM events),
    fs AS (SELECT user_id, MIN(d) AS first_d FROM du GROUP BY user_id),
    today AS (
      SELECT du.d, du.user_id,
             fs.first_d = du.d AS is_new,
             y.user_id IS NOT NULL AS was_yesterday
      FROM du JOIN fs ON du.user_id = fs.user_id
      LEFT JOIN du y ON y.user_id = du.user_id AND y.d = du.d - 1),
    churn AS (
      SELECT y.d + 1 AS d, COUNT(*) AS churned
      FROM du y LEFT JOIN du t ON t.user_id = y.user_id AND t.d = y.d + 1
      WHERE t.user_id IS NULL GROUP BY y.d + 1),
    daily AS (
      SELECT d,
             CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
               AS new_users,
             CAST(SUM(CASE WHEN NOT is_new AND was_yesterday THEN 1 ELSE 0 END)
               AS BIGINT) AS retained,
             CAST(SUM(CASE WHEN NOT is_new AND NOT was_yesterday THEN 1 ELSE 0
               END) AS BIGINT) AS resurrected,
             COUNT(*) AS dau
      FROM today GROUP BY d)
    SELECT CAST(daily.d AS TIMESTAMP) AS d, dau, new_users, retained,
           resurrected, COALESCE(churn.churned, 0) AS churned
    FROM daily LEFT JOIN churn ON daily.d = churn.d
    """,
    description="growth accounting: DAU decomposed into new / retained / "
    "resurrected, with churned from the previous day's actives — the "
    "DAU(t)-DAU(t-1) = new + resurrected - churned identity every growth "
    "team reads; distinct (day, user) frame, first-seen join, previous-day "
    "self-join — integer set logic, shuffles on the activity frame only",
    tags=("behavior", "timeseries"),
)
def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("d"), "user_id"
    ).distinct()
    fs = du.groupBy("user_id").agg(F.min("d").alias("first_d"))
    y = du.select(F.col("user_id").alias("y_user"), F.col("d").alias("y_d"))
    today = (
        du.join(fs, "user_id")
        .join(
            y,
            (F.col("user_id") == F.col("y_user"))
            & (F.col("y_d") == F.date_sub("d", 1)),
            "left",
        )
        .select(
            "d",
            (F.col("first_d") == F.col("d")).alias("is_new"),
            F.col("y_user").isNotNull().alias("was_yesterday"),
        )
    )
    t2 = du.select(F.col("user_id").alias("t_user"), F.col("d").alias("t_d"))
    churn = (
        du.join(
            t2,
            (F.col("user_id") == F.col("t_user"))
            & (F.col("t_d") == F.date_add("d", 1)),
            "left",
        )
        .where(F.col("t_user").isNull())
        .groupBy(F.date_add("d", 1).alias("d"))
        .agg(F.count(F.lit(1)).alias("churned"))
    )
    daily = today.groupBy("d").agg(
        F.sum(F.when(F.col("is_new"), 1).otherwise(0)).alias("new_users"),
        F.sum(
            F.when(~F.col("is_new") & F.col("was_yesterday"), 1).otherwise(0)
        ).alias("retained"),
        F.sum(
            F.when(~F.col("is_new") & ~F.col("was_yesterday"), 1).otherwise(0)
        ).alias("resurrected"),
        F.count(F.lit(1)).alias("dau"),
    )
    return (
        daily.join(churn, "d", "left")
        .select(
            F.col("d").cast("timestamp_ntz").alias("d"),
            "dau",
            "new_users",
            "retained",
            "resurrected",
            F.coalesce("churned", F.lit(0)).alias("churned"),
        )
    )


@query(
    "q_conversion_lag_cdf",
    # Funnel latency: of the users who convert (first view -> first
    # purchase after it), what share converts within 1h / 6h / 24h / ever —
    # the conversion-lag CDF at fixed horizons product teams put on SLAs.
    # Lags are integer microseconds from the q_event_funnel chained-MIN
    # construction; the CDF is four conditional counts over the per-user
    # frame divided by the converter count — all integers to four final
    # divisions.
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1
      FROM events GROUP BY user_id),
    s2 AS (
      SELECT e.user_id,
             MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > s1.t1
                      THEN epoch_us(e.ts) - epoch_us(s1.t1) END) AS lag_us
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE s1.t1 IS NOT NULL
      GROUP BY e.user_id),
    conv AS (SELECT lag_us FROM s2 WHERE lag_us IS NOT NULL)
    SELECT COUNT(*) AS n_converters,
           ROUND(SUM(CASE WHEN lag_us <= 3600000000 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS within_1h,
           ROUND(SUM(CASE WHEN lag_us <= 21600000000 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS within_6h,
           ROUND(SUM(CASE WHEN lag_us <= 86400000000 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS within_24h
    FROM conv
    """,
    description="conversion-lag CDF at fixed horizons: first view to first "
    "subsequent purchase per user (chained conditional MINs, integer "
    "microsecond lags), share of converters within 1h / 6h / 24h — the "
    "funnel-latency SLA report; two user-keyed aggregates, four conditional "
    "counts, one row out",
    tags=("behavior", "timeseries"),
)
def q_conversion_lag_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    s1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t1")
    )
    t1us = F.unix_micros(F.col("t1").cast("timestamp"))
    s2 = (
        ev.join(s1, "user_id")
        .where(F.col("t1").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t1")),
                    us - t1us,
                )
            ).alias("lag_us")
        )
    )
    conv = s2.where(F.col("lag_us").isNotNull())
    n = F.count(F.lit(1))
    share = lambda bound: F.round(
        F.sum(F.when(F.col("lag_us") <= bound, 1).otherwise(0))
        / n.cast("double"),
        6,
    )
    return conv.agg(
        n.alias("n_converters"),
        share(3_600_000_000).alias("within_1h"),
        share(21_600_000_000).alias("within_6h"),
        share(86_400_000_000).alias("within_24h"),
    )
