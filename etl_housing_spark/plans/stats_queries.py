"""Statistical-analysis queries (round 3): distribution summaries, association
tests, and corpus-distribution diagnostics.

Reference parity: the reference's notebooks profile distributions with pandas
``describe()``/``value_counts()`` (trulia_csv_to_nlp.ipynb cells 6-10) and fit
models to inspect feature association (cells 30-36). These queries generalize
that surface — deterministic mode/median, decile bucketing, a chi-square
independence statistic, a Zipf rank-frequency fit, and Jensen-Shannon
divergence between per-source token distributions (the "does this source look
like the corpus?" drift check a pretraining pipeline runs before mixing).

Cross-engine determinism: every double aggregation routes through the
decimal-exact ``dsum`` (see ``_util``) so Spark's partial+final and DuckDB's
vectorized accumulation cannot diverge; median and mode are DISCRETE
constructions (integer-rank quantile, count+tie-break) rather than engine
built-ins whose tie semantics differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ._util import DEC, dsum, fan_out, sql_dsum
from .registry import query


@query(
    "q_mode_median",
    # Both statistics come from ONE value histogram per lang (single scan of
    # documents, one shuffle): median is the discrete type-1 quantile by
    # integer rank (2·cum ≥ tot — no interpolation, so no float parity risk),
    # mode is (count desc, value asc) rank 1 — deterministic under ties,
    # unlike engine mode() whose tie choice is unspecified on both engines.
    oracle="""
    WITH h AS (
      SELECT lang, n_chars AS v, COUNT(*) AS cnt
      FROM documents GROUP BY lang, n_chars),
    w AS (
      SELECT lang, v, cnt,
             SUM(cnt) OVER (PARTITION BY lang ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(cnt) OVER (PARTITION BY lang) AS tot,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, v ASC) AS mode_rn
      FROM h)
    SELECT lang,
           CAST(MIN(CASE WHEN 2 * cum >= tot THEN v END) AS BIGINT) AS median_chars,
           CAST(MIN(CASE WHEN mode_rn = 1 THEN v END) AS BIGINT) AS mode_chars,
           CAST(MIN(CASE WHEN mode_rn = 1 THEN cnt END) AS BIGINT) AS mode_count,
           CAST(MIN(tot) AS BIGINT) AS n_docs
    FROM w GROUP BY lang
    """,
    description="deterministic per-group mode + discrete median from one value "
    "histogram: groupBy(lang, value) count, then windowed cumulative rank — single "
    "scan, one shuffle on (lang, value), two tiny windows on the histogram; engine "
    "mode()/median() built-ins are avoided because their tie/interpolation "
    "semantics are engine-specific",
    tags=("stats",),
)
def q_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = docs.groupBy("lang", F.col("n_chars").alias("v")).agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("lang")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("lang")
    w_mode = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("v"))
    w = h.select(
        "lang",
        "v",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("tot"),
        F.row_number().over(w_mode).alias("mode_rn"),
    )
    return w.groupBy("lang").agg(
        F.min(F.when(2 * F.col("cum") >= F.col("tot"), F.col("v"))).alias("median_chars"),
        F.min(F.when(F.col("mode_rn") == 1, F.col("v"))).alias("mode_chars"),
        F.min(F.when(F.col("mode_rn") == 1, F.col("cnt"))).alias("mode_count"),
        F.min("tot").alias("n_docs"),
    )


@query(
    "q_ntile_buckets",
    # ntile over a TOTALLY ordered key (n_chars, doc_id tie-break) is
    # deterministic on both engines: the SQL-standard bucket rule
    # (first `count % n` buckets take the extra row) is identical. The
    # global sort is one range-partitioned exchange; per-bucket stats then
    # partial-aggregate. The decile report is the length-stratification step
    # of a corpus pipeline (pack short docs together, inspect tail buckets).
    oracle=f"""
    WITH t AS (
      SELECT doc_id, n_chars,
             NTILE(10) OVER (ORDER BY n_chars, doc_id) AS decile
      FROM documents)
    SELECT decile,
           COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           ROUND({sql_dsum('n_chars')} / COUNT(*), 6) AS avg_chars
    FROM t GROUP BY decile
    """,
    description="decile bucketing by document length: NTILE(10) over the "
    "deterministic (n_chars, doc_id) order, then per-bucket min/max/avg — one "
    "range exchange for the global order + one partial-agg shuffle; the "
    "length-stratification primitive for packing/inspection",
    tags=("stats",),
)
def q_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "n_chars",
        F.ntile(10).over(Window.orderBy("n_chars", "doc_id")).alias("decile"),
    )
    return t.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(dsum("n_chars") / F.count(F.lit(1)), 6).alias("avg_chars"),
    )


@query(
    "q_chi2_independence",
    # Pearson chi-square for lang ⊥ source over documents. The expected-count
    # grid MUST include zero-observed cells (o=0 still contributes e), so the
    # grid is rowtotals × coltotals (|langs|·|sources| rows — tiny, and both
    # marginals broadcast at any corpus scale), left-joined with observed
    # cells. e = rt·ct/N on identical bigint operands → identical doubles;
    # the (o-e)²/e terms sum through the decimal-exact dsum.
    oracle=f"""
    WITH cells AS (
      SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY lang, source),
    rt AS (SELECT lang, SUM(o) AS rtot FROM cells GROUP BY lang),
    ct AS (SELECT source, SUM(o) AS ctot FROM cells GROUP BY source),
    n AS (SELECT SUM(o) AS n FROM cells),
    grid AS (
      SELECT rt.lang, ct.source,
             CAST(rt.rtot AS DOUBLE) * CAST(ct.ctot AS DOUBLE) / CAST(n.n AS DOUBLE) AS e
      FROM rt CROSS JOIN ct CROSS JOIN n),
    terms AS (
      SELECT grid.lang, grid.source,
             (COALESCE(cells.o, 0) - grid.e) * (COALESCE(cells.o, 0) - grid.e) / grid.e AS t
      FROM grid LEFT JOIN cells ON grid.lang = cells.lang AND grid.source = cells.source)
    SELECT ROUND({sql_dsum('t')}, 6) AS chi2,
           CAST((SELECT COUNT(*) FROM rt) - 1 AS BIGINT)
             * CAST((SELECT COUNT(*) FROM ct) - 1 AS BIGINT) AS dof
    FROM terms
    """,
    description="Pearson chi-square independence statistic for lang × source: one "
    "scan to the contingency cells, marginals re-aggregated from the cells (no "
    "second scan), expected grid built as rowtotals × coltotals so zero-observed "
    "cells contribute correctly, terms summed decimal-exact — the 'is this "
    "attribute independent of that one' screen of corpus audits",
    tags=("stats",),
)
def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rt = cells.groupBy("lang").agg(F.sum("o").alias("rtot"))
    ct = cells.groupBy("source").agg(F.sum("o").alias("ctot"))
    n = cells.agg(F.sum("o").alias("n"))
    grid = (
        rt.crossJoin(F.broadcast(ct))
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "source",
            (
                F.col("rtot").cast("double") * F.col("ctot").cast("double") / F.col("n").cast("double")
            ).alias("e"),
        )
    )
    terms = grid.join(cells, ["lang", "source"], "left").select(
        ((F.coalesce(F.col("o"), F.lit(0)) - F.col("e")) ** 2 / F.col("e")).alias("t")
    )
    dof = (
        rt.agg(F.count(F.lit(1)).alias("r"))
        .crossJoin(ct.agg(F.count(F.lit(1)).alias("c")))
        .select(((F.col("r") - 1) * (F.col("c") - 1)).cast("bigint").alias("dof"))
    )
    return terms.agg(F.round(dsum("t"), 6).alias("chi2")).crossJoin(F.broadcast(dof))


@query(
    "q_zipf_slope",
    # Least-squares slope of ln(freq) on ln(rank) over the token frequency
    # table — the Zipf-law fit that flags synthetic/degenerate corpora
    # (natural language ≈ −1). regr_slope() is NOT used: its double
    # accumulation is order-dependent on both engines. Instead the four
    # component sums (Σx, Σy, Σxy, Σx²) run decimal-exact and the closed form
    # evaluates once on identical operands. Rank = row_number over
    # (freq desc, token asc): total order, engine-agnostic.
    oracle=f"""
    WITH freq AS (
      SELECT tok, COUNT(*) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY tok),
    ranked AS (
      SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY c DESC, tok ASC) AS DOUBLE)) AS x,
             ln(CAST(c AS DOUBLE)) AS y
      FROM freq),
    s AS (
      SELECT COUNT(*) AS n, {sql_dsum('x')} AS sx, {sql_dsum('y')} AS sy,
             {sql_dsum('x * y')} AS sxy, {sql_dsum('x * x')} AS sxx
      FROM ranked)
    SELECT ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
           CAST(n AS BIGINT) AS n_tokens
    FROM s
    """,
    description="Zipf rank-frequency slope of the corpus token distribution: "
    "explode + grouped count, deterministic row_number rank, least-squares slope "
    "from decimal-exact component sums (engine regr_slope avoided for order "
    "dependence) — natural text fits ≈ −1, template/synthetic corpora deviate; "
    "one scan, two shuffles (token agg + rank exchange)",
    tags=("stats", "text"),
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ranked = freq.select(
        F.log(F.row_number().over(Window.orderBy(F.desc("c"), F.asc("tok"))).cast("double")).alias(
            "x"
        ),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return s.select(
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("zipf_slope"),
        F.col("n").cast("bigint").alias("n_tokens"),
    )


@query(
    "q_js_divergence",
    # Jensen-Shannon divergence of each source's token distribution vs the
    # corpus distribution — the source-drift check run before fixing a
    # pretraining mixture. The sum must run over the FULL corpus vocabulary
    # per source (tokens absent from a source still contribute ½·q·log2 2),
    # so the term grid is corpus-tokens × sources (|V|·|sources| rows; the
    # source list and totals broadcast; the grid partial-aggregates straight
    # back down to |sources| rows). p,q,m derive from bigint counts →
    # identical doubles; terms sum decimal-exact; log2 on both engines.
    oracle=f"""
    WITH occ AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
    sc AS (SELECT source, tok, COUNT(*) AS cs FROM occ GROUP BY source, tok),
    stot AS (SELECT source, SUM(cs) AS ts FROM sc GROUP BY source),
    corpus AS (SELECT tok, SUM(cs) AS c FROM sc GROUP BY tok),
    ctot AS (SELECT SUM(c) AS t FROM corpus),
    grid AS (
      SELECT stot.source, corpus.tok,
             COALESCE(sc.cs, 0) / CAST(stot.ts AS DOUBLE) AS p,
             corpus.c / CAST(ctot.t AS DOUBLE) AS q
      FROM corpus CROSS JOIN ctot CROSS JOIN stot
      LEFT JOIN sc ON sc.source = stot.source AND sc.tok = corpus.tok),
    terms AS (
      SELECT source,
             CASE WHEN p > 0 THEN 0.5 * p * log2(p / ((p + q) / 2)) ELSE 0 END
             + CASE WHEN q > 0 THEN 0.5 * q * log2(q / ((p + q) / 2)) ELSE 0 END AS t
      FROM grid)
    SELECT source, ROUND({sql_dsum('t')}, 6) AS jsd
    FROM terms GROUP BY source
    """,
    description="Jensen-Shannon divergence between each source's token "
    "distribution and the corpus distribution (bounded [0,1] in log2 — the "
    "mixture-drift diagnostic): per-source and corpus token counts from one "
    "explode scan, full-vocabulary term grid so absent tokens contribute their "
    "½·q mass, decimal-exact term sums — two shuffles on token keys plus one "
    "broadcast of the 20-row source totals",
    tags=("stats", "text"),
)
def q_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
    sc = occ.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("cs"))
    stot = sc.groupBy("source").agg(F.sum("cs").alias("ts"))
    corpus = sc.groupBy("tok").agg(F.sum("cs").alias("c"))
    ctot = corpus.agg(F.sum("c").alias("t"))
    grid = (
        corpus.crossJoin(F.broadcast(ctot))
        .crossJoin(F.broadcast(stot))
        .join(sc, ["source", "tok"], "left")
        .select(
            "source",
            (F.coalesce(F.col("cs"), F.lit(0)) / F.col("ts").cast("double")).alias("p"),
            (F.col("c") / F.col("t").cast("double")).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    term = F.when(F.col("p") > 0, 0.5 * F.col("p") * F.log2(F.col("p") / m)).otherwise(
        F.lit(0.0)
    ) + F.when(F.col("q") > 0, 0.5 * F.col("q") * F.log2(F.col("q") / m)).otherwise(F.lit(0.0))
    return grid.select("source", term.alias("t")).groupBy("source").agg(
        F.round(dsum("t"), 6).alias("jsd")
    )


@query(
    "q_ab_welch",
    # The A/B experiment readout: Welch's unequal-variance t statistic
    # between two deterministic halves of the event stream (even/odd ids —
    # the same split convention as the streaming anomaly replay). Sums are
    # decimal-exact (values and their DOUBLE products quantized at 6 dp
    # before summing — the dsum / q_gini recipe, unscaled values inside
    # 2^53 where both engines' decimal→double is exactly rounded); every
    # downstream mean/variance/t/df is the same double operand-for-operand,
    # so the one-row statistic hash-matches.
    oracle=f"""
    WITH g AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END AS grp,
             COUNT(*) AS n,
             {sql_dsum('value')} AS s,
             CAST(SUM(CAST(value * value AS DECIMAL(18,6))) AS DOUBLE) AS s2
      FROM events GROUP BY 1),
    w AS (
      SELECT MIN(CASE WHEN grp = 'a' THEN n END) AS na,
             MIN(CASE WHEN grp = 'b' THEN n END) AS nb,
             MIN(CASE WHEN grp = 'a' THEN s END) AS sa,
             MIN(CASE WHEN grp = 'b' THEN s END) AS sb,
             MIN(CASE WHEN grp = 'a' THEN s2 END) AS sa2,
             MIN(CASE WHEN grp = 'b' THEN s2 END) AS sb2
      FROM g),
    c AS (
      SELECT na, nb, sa / na AS ma, sb / nb AS mb,
             (sa2 - na * (sa / na) * (sa / na)) / (na - 1) AS va,
             (sb2 - nb * (sb / nb) * (sb / nb)) / (nb - 1) AS vb
      FROM w)
    SELECT na, nb,
           ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
           ROUND((ma - mb) / sqrt(va / na + vb / nb), 6) AS t_stat,
           ROUND((va / na + vb / nb) * (va / na + vb / nb)
                 / ((va / na) * (va / na) / (na - 1)
                    + (vb / nb) * (vb / nb) / (nb - 1)), 6) AS welch_df
    FROM c
    """,
    description="A/B experiment readout: Welch's unequal-variance t statistic "
    "+ Satterthwaite degrees of freedom between two deterministic halves of "
    "the event stream — per-group decimal-exact Σv and Σv² from one grouped "
    "scan, then pure double arithmetic on the two-row aggregate; the "
    "experiment-analysis primitive alongside the chi-square / KS family",
    tags=("stats", "behavior"),
)
def q_ab_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("grp")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("s"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(18,6)"))
        .cast("double")
        .alias("s2"),
    )
    w = g.agg(
        *[
            F.min(F.when(F.col("grp") == grp, F.col(c))).alias(f"{c}{grp}")
            for grp in ("a", "b")
            for c in ("n", "s", "s2")
        ]
    )
    ma, mb = F.col("sa") / F.col("na"), F.col("sb") / F.col("nb")
    c = w.select(
        "na",
        "nb",
        ma.alias("ma"),
        mb.alias("mb"),
        ((F.col("s2a") - F.col("na") * ma * ma) / (F.col("na") - 1)).alias("va"),
        ((F.col("s2b") - F.col("nb") * mb * mb) / (F.col("nb") - 1)).alias("vb"),
    )
    vna, vnb = F.col("va") / F.col("na"), F.col("vb") / F.col("nb")
    return c.select(
        "na",
        "nb",
        F.round("ma", 6).alias("mean_a"),
        F.round("mb", 6).alias("mean_b"),
        F.round((F.col("ma") - F.col("mb")) / F.sqrt(vna + vnb), 6).alias("t_stat"),
        F.round(
            (vna + vnb) * (vna + vnb)
            / (vna * vna / (F.col("na") - 1) + vnb * vnb / (F.col("nb") - 1)),
            6,
        ).alias("welch_df"),
    )


@query(
    "q_lorenz_curve",
    # The distribution-shape companion to q_gini's scalar: customers ranked
    # into revenue deciles (deterministic NTILE over (revenue, custkey)),
    # then cumulative population share vs cumulative revenue share — the
    # Lorenz curve a concentration report plots. Revenue per customer is a
    # decimal-exact sum; the decile windows run on the |customers|-row
    # aggregate and the cumulative shares on the 10-row decile frame.
    oracle=f"""
    WITH rev AS (
      SELECT o_custkey, {sql_dsum('o_totalprice')} AS r
      FROM orders GROUP BY o_custkey),
    d AS (
      SELECT NTILE(10) OVER (ORDER BY r, o_custkey) AS decile, r FROM rev),
    agg AS (
      SELECT decile, COUNT(*) AS n,
             CAST(SUM(CAST(r AS DECIMAL(18,6))) AS DOUBLE) AS dr
      FROM d GROUP BY decile),
    t AS (
      SELECT SUM(n) AS tn,
             CAST(SUM(CAST(dr AS DECIMAL(18,6))) AS DOUBLE) AS tr
      FROM agg)
    SELECT decile, n,
           ROUND(CAST(SUM(n) OVER w AS BIGINT) / CAST(t.tn AS DOUBLE), 6)
             AS cum_pop_share,
           ROUND(CAST(SUM(CAST(dr AS DECIMAL(18,6))) OVER w AS DOUBLE) / t.tr, 6)
             AS cum_rev_share
    FROM agg CROSS JOIN t
    WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    description="Lorenz concentration curve over customer revenue: decimal-"
    "exact revenue per customer, deterministic NTILE(10) deciles, cumulative "
    "population vs revenue shares on the 10-row decile frame — the "
    "distribution-shape report behind q_gini's scalar; windows never touch "
    "the fact table",
    tags=("stats", "behavior", "window"),
)
def q_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(dsum("o_totalprice").alias("r"))
    d = rev.select(
        F.ntile(10).over(Window.orderBy("r", "o_custkey")).alias("decile"), "r"
    )
    agg = d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("r").cast("decimal(18,6)")).cast("double").alias("dr"),
    )
    t = agg.agg(
        F.sum("n").alias("tn"),
        F.sum(F.col("dr").cast("decimal(18,6)")).cast("double").alias("tr"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        agg.crossJoin(F.broadcast(t))
        .select(
            "decile",
            "n",
            F.round(
                F.sum("n").over(w).cast("long") / F.col("tn").cast("double"), 6
            ).alias("cum_pop_share"),
            F.round(
                F.sum(F.col("dr").cast("decimal(18,6)")).over(w).cast("double")
                / F.col("tr"),
                6,
            ).alias("cum_rev_share"),
        )
    )


@query(
    "q_target_encoding",
    # Smoothed mean-target encoding (the ML feature-prep staple): encode a
    # categorical column by the target mean, shrunk toward the global mean
    # with pseudo-count m — enc = (n·mean_cat + m·mean_global)/(n + m).
    # Means come from decimal-exact sums divided once; the smoothing
    # arithmetic runs operand-for-operand identically on the |categories|-row
    # aggregate, so the encoding table hash-matches. At training scale the
    # encoding is a broadcast map-join back onto the fact — a dim-sized
    # artifact regardless of fact volume.
    oracle=f"""
    WITH cat AS (
      SELECT c.c_mktsegment AS seg, COUNT(*) AS n,
             {sql_dsum('o.o_totalprice')} AS s
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment),
    g AS (
      SELECT SUM(n) AS tn, CAST(SUM(CAST(s AS DECIMAL(18,6))) AS DOUBLE) AS ts
      FROM cat)
    SELECT seg, n,
           ROUND(s / n, 6) AS seg_mean,
           ROUND((n * (s / n) + 20 * (g.ts / g.tn)) / (n + 20), 6) AS encoded
    FROM cat CROSS JOIN g
    """,
    description="smoothed mean-target encoding of market segment against order "
    "value (pseudo-count m=20 shrinkage toward the global mean): decimal-exact "
    "per-category and global sums from one joined scan, smoothing arithmetic "
    "on the categories-row aggregate — the leakage-safe categorical encoder a "
    "training pipeline broadcasts back onto the fact",
    tags=("stats", "pipeline"),
)
def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cat = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("s"))
    )
    g = cat.agg(
        F.sum("n").alias("tn"),
        F.sum(F.col("s").cast("decimal(18,6)")).cast("double").alias("ts"),
    )
    seg_mean = F.col("s") / F.col("n")
    return (
        cat.crossJoin(F.broadcast(g))
        .select(
            "seg",
            "n",
            F.round(seg_mean, 6).alias("seg_mean"),
            F.round(
                (F.col("n") * seg_mean + 20 * (F.col("ts") / F.col("tn")))
                / (F.col("n") + 20),
                6,
            ).alias("encoded"),
        )
    )


@query(
    "q_woe_iv",
    # Weight-of-evidence / information value — the credit-scoring predictor
    # audit: for the binary outcome "line returned" (l_returnflag = 'R')
    # against the part brand, WoE_i = ln((bad_i/bads)/(good_i/goods)) and
    # IV = Σ (bad%_i − good%_i)·WoE_i. Counts are integers; each ratio and
    # ln runs on identical operands; the IV term sum is decimal-exact over
    # the |brands|-row frame.
    oracle=f"""
    WITH j AS (
      SELECT p.p_brand AS brand,
             CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS bad
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    c AS (
      SELECT brand,
             SUM(bad) AS nb,
             COUNT(*) - SUM(bad) AS ng
      FROM j GROUP BY brand),
    t AS (SELECT SUM(nb) AS tb, SUM(ng) AS tg FROM c),
    w AS (
      SELECT brand, nb, ng,
             ln((nb / CAST(t.tb AS DOUBLE)) / (ng / CAST(t.tg AS DOUBLE))) AS woe,
             (nb / CAST(t.tb AS DOUBLE) - ng / CAST(t.tg AS DOUBLE))
               * ln((nb / CAST(t.tb AS DOUBLE)) / (ng / CAST(t.tg AS DOUBLE)))
               AS iv_term
      FROM c CROSS JOIN t
      WHERE nb > 0 AND ng > 0)
    SELECT brand, CAST(nb AS BIGINT) AS n_bad, CAST(ng AS BIGINT) AS n_good,
           ROUND(woe, 6) AS woe,
           ROUND(CAST(SUM(CAST(iv_term AS DECIMAL(18,6))) OVER () AS DOUBLE), 6)
             AS iv_total
    FROM w
    """,
    description="weight-of-evidence + information value of part brand for the "
    "returned-line outcome: integer good/bad counts per brand from one joined "
    "scan, per-brand WoE on identical double ratios, IV as the decimal-exact "
    "sum of contribution terms reported alongside each row — the predictive-"
    "power audit run before a feature enters a risk model",
    tags=("stats", "pipeline"),
)
def q_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li.l_partkey == F.col("p_partkey"),
    ).select(
        F.col("p_brand").alias("brand"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("bad"),
    )
    c = j.groupBy("brand").agg(
        F.sum("bad").alias("nb"),
        (F.count(F.lit(1)) - F.sum("bad")).alias("ng"),
    )
    t = c.agg(F.sum("nb").alias("tb"), F.sum("ng").alias("tg"))
    pb = F.col("nb") / F.col("tb").cast("double")
    pg = F.col("ng") / F.col("tg").cast("double")
    woe = F.log(pb / pg)
    w = (
        c.crossJoin(F.broadcast(t))
        .where((F.col("nb") > 0) & (F.col("ng") > 0))
        .select(
            "brand",
            F.col("nb").cast("bigint").alias("n_bad"),
            F.col("ng").cast("bigint").alias("n_good"),
            woe.alias("woe"),
            ((pb - pg) * woe).alias("iv_term"),
        )
    )
    iv = F.round(
        F.sum(F.col("iv_term").cast("decimal(18,6)"))
        .over(Window.partitionBy())
        .cast("double"),
        6,
    )
    return w.select(
        "brand", "n_bad", "n_good", F.round("woe", 6).alias("woe"), iv.alias("iv_total")
    )


@query(
    "q_price_volume_mix",
    # Price-volume decomposition of the revenue change between two periods
    # (the finance waterfall): per return flag, ΔRev splits exactly into a
    # volume effect (Δqty at old unit price) and a price effect (Δunit-price
    # at new qty) — (q2−q1)·u1 + (u2−u1)·q2 ≡ rev2 − rev1. Period sums are
    # decimal-exact; unit prices and effects are identical double arithmetic
    # on the |flags|-row aggregate.
    oracle=f"""
    WITH p AS (
      SELECT l_returnflag AS flag,
             (l_shipdate >= TIMESTAMP '1998-01-01 00:00:00') AS p2,
             {sql_dsum('l_quantity')} AS q,
             {sql_dsum('l_extendedprice')} AS rev
      FROM lineitem GROUP BY 1, 2),
    w AS (
      SELECT flag,
             MIN(CASE WHEN NOT p2 THEN q END) AS q1,
             MIN(CASE WHEN p2 THEN q END) AS q2,
             MIN(CASE WHEN NOT p2 THEN rev END) AS r1,
             MIN(CASE WHEN p2 THEN rev END) AS r2
      FROM p GROUP BY flag)
    SELECT flag,
           ROUND(r1, 6) AS rev_p1, ROUND(r2, 6) AS rev_p2,
           ROUND(r2 - r1, 6) AS delta,
           ROUND((q2 - q1) * (r1 / q1), 6) AS volume_effect,
           ROUND((r2 / q2 - r1 / q1) * q2, 6) AS price_effect
    FROM w
    """,
    description="price-volume-mix revenue decomposition per return flag "
    "between two shipping periods: decimal-exact quantity and revenue sums "
    "per (flag, period), volume effect = Δqty x old unit price, price effect "
    "= Δunit-price x new qty (summing exactly to ΔRev) — the finance "
    "waterfall behind every 'why did revenue move' review",
    tags=("stats", "behavior"),
)
def q_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        (
            F.col("l_shipdate")
            >= F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
        ).alias("p2"),
    ).agg(dsum("l_quantity").alias("q"), dsum("l_extendedprice").alias("rev"))
    w = p.groupBy("flag").agg(
        F.min(F.when(~F.col("p2"), F.col("q"))).alias("q1"),
        F.min(F.when(F.col("p2"), F.col("q"))).alias("q2"),
        F.min(F.when(~F.col("p2"), F.col("rev"))).alias("r1"),
        F.min(F.when(F.col("p2"), F.col("rev"))).alias("r2"),
    )
    u1 = F.col("r1") / F.col("q1")
    u2 = F.col("r2") / F.col("q2")
    return w.select(
        "flag",
        F.round("r1", 6).alias("rev_p1"),
        F.round("r2", 6).alias("rev_p2"),
        F.round(F.col("r2") - F.col("r1"), 6).alias("delta"),
        F.round((F.col("q2") - F.col("q1")) * u1, 6).alias("volume_effect"),
        F.round((u2 - u1) * F.col("q2"), 6).alias("price_effect"),
    )


@query(
    "q_hhi",
    # Herfindahl-Hirschman concentration index per nation: the sum of
    # squared customer revenue shares — the antitrust-standard market-
    # concentration cousin of q_gini (10000 x Σ share² on the 0-10000
    # convention; monopoly = 10000, atomistic -> 0). Per-customer revenue is
    # decimal-exact; shares and their squares are identical double
    # arithmetic; the share-square sum runs decimal-exact over the
    # per-customer frame — the one window-free concentration measure.
    oracle=f"""
    WITH rev AS (
      SELECT c.c_nationkey AS nk, o.o_custkey AS ck,
             {sql_dsum('o.o_totalprice')} AS r
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    tot AS (
      SELECT nk, CAST(SUM(CAST(r AS DECIMAL(18,6))) AS DOUBLE) AS t,
             COUNT(*) AS n_cust
      FROM rev GROUP BY nk)
    SELECT n.n_name AS nation, tot.n_cust,
           ROUND({sql_dsum('10000 * (rev.r / tot.t) * (rev.r / tot.t)')}, 6)
             AS hhi
    FROM rev JOIN tot ON rev.nk = tot.nk
    JOIN nation n ON rev.nk = n.n_nationkey
    GROUP BY n.n_name, tot.n_cust
    """,
    description="Herfindahl-Hirschman market-concentration index per nation "
    "(10000 x sum of squared customer revenue shares): decimal-exact revenue "
    "per customer, identical-double shares, decimal-exact share-square sums — "
    "the antitrust-standard concentration measure next to q_gini/q_lorenz_curve, "
    "computed with two grouped aggregates and zero windows",
    tags=("stats", "behavior"),
)
def q_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    rev = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(F.col("c_nationkey").alias("nk"), F.col("o_custkey").alias("ck"))
        .agg(dsum("o_totalprice").alias("r"))
    )
    tot = rev.groupBy("nk").agg(
        F.sum(F.col("r").cast(DEC)).cast("double").alias("t"),
        F.count(F.lit(1)).alias("n_cust"),
    )
    share2 = 10000 * (F.col("r") / F.col("t")) * (F.col("r") / F.col("t"))
    return (
        rev.join(tot, "nk")
        .join(F.broadcast(nat), F.col("nk") == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "n_cust")
        .agg(F.round(dsum(share2), 6).alias("hhi"))
    )


@query(
    "q_price_index",
    # Classical price indices between two shipping periods over the common
    # part basket: Laspeyres (base-period weights), Paasche (current-period
    # weights), Fisher (geometric mean) — the inflation-measurement
    # companion to q_price_volume_mix's waterfall. Per-(part, period) sums
    # are decimal-exact; unit prices divide identical doubles; the four
    # basket sums run decimal-exact over the common-part frame; the indices
    # are three final double ops.
    oracle=f"""
    WITH pp AS (
      SELECT l_partkey AS pk,
             (l_shipdate >= TIMESTAMP '1998-01-01 00:00:00') AS p2,
             {sql_dsum('l_quantity')} AS q,
             {sql_dsum('l_extendedprice')} AS rev
      FROM lineitem GROUP BY 1, 2),
    j AS (
      SELECT a.pk, a.q AS q1, a.rev / a.q AS u1, b.q AS q2, b.rev / b.q AS u2
      FROM pp a JOIN pp b ON a.pk = b.pk AND NOT a.p2 AND b.p2),
    s AS (
      SELECT COUNT(*) AS n_parts,
             {sql_dsum('u2 * q1')} AS l_num, {sql_dsum('u1 * q1')} AS l_den,
             {sql_dsum('u2 * q2')} AS p_num, {sql_dsum('u1 * q2')} AS p_den
      FROM j)
    SELECT n_parts,
           ROUND(l_num / l_den, 6) AS laspeyres,
           ROUND(p_num / p_den, 6) AS paasche,
           ROUND(sqrt((l_num / l_den) * (p_num / p_den)), 6) AS fisher
    FROM s
    """,
    description="Laspeyres / Paasche / Fisher price indices between two "
    "shipping periods over the common part basket: decimal-exact per-(part, "
    "period) quantity and revenue sums, identical-double unit prices, "
    "decimal-exact basket sums, three final ratios — the inflation-"
    "measurement companion to the PVM waterfall; two grouped passes and one "
    "self-join on the part key",
    tags=("stats", "behavior"),
)
def q_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pp = li.groupBy(
        F.col("l_partkey").alias("pk"),
        (
            F.col("l_shipdate")
            >= F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
        ).alias("p2"),
    ).agg(dsum("l_quantity").alias("q"), dsum("l_extendedprice").alias("rev"))
    a = pp.where(~F.col("p2")).select(
        "pk", F.col("q").alias("q1"), (F.col("rev") / F.col("q")).alias("u1")
    )
    b = pp.where(F.col("p2")).select(
        "pk", F.col("q").alias("q2"), (F.col("rev") / F.col("q")).alias("u2")
    )
    j = a.join(b, "pk")
    s = j.agg(
        F.count(F.lit(1)).alias("n_parts"),
        dsum(F.col("u2") * F.col("q1")).alias("l_num"),
        dsum(F.col("u1") * F.col("q1")).alias("l_den"),
        dsum(F.col("u2") * F.col("q2")).alias("p_num"),
        dsum(F.col("u1") * F.col("q2")).alias("p_den"),
    )
    las = F.col("l_num") / F.col("l_den")
    paa = F.col("p_num") / F.col("p_den")
    return s.select(
        "n_parts",
        F.round(las, 6).alias("laspeyres"),
        F.round(paa, 6).alias("paasche"),
        F.round(F.sqrt(las * paa), 6).alias("fisher"),
    )


@query(
    "q_abc_analysis",
    # ABC inventory classification: parts ranked by revenue, classified A
    # (top 80% of cumulative revenue share), B (next 15%), C (tail) — the
    # stocking-policy report every inventory system ships. Revenue per part
    # is decimal-exact; the cumulative share window runs on the per-part
    # aggregate ordered by (revenue DESC, part) — deterministic under ties;
    # class boundaries compare identical doubles.
    oracle=f"""
    WITH rev AS (
      SELECT l_partkey AS pk, {sql_dsum('l_extendedprice')} AS r
      FROM lineitem GROUP BY l_partkey),
    t AS (SELECT CAST(SUM(CAST(r AS DECIMAL(18,6))) AS DOUBLE) AS tr FROM rev),
    c AS (
      SELECT pk, r,
             CAST(SUM(CAST(r AS DECIMAL(18,6))) OVER (ORDER BY r DESC, pk
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               / t.tr AS cum_share
      FROM rev CROSS JOIN t)
    SELECT CASE WHEN cum_share <= 0.8 THEN 'A'
                WHEN cum_share <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class,
           COUNT(*) AS n_parts,
           ROUND({sql_dsum('r')}, 6) AS class_revenue,
           ROUND(MAX(cum_share), 6) AS cum_share_ceiling
    FROM c GROUP BY 1
    """,
    description="ABC inventory classification: parts ranked by decimal-exact "
    "revenue, cumulative-share window over the per-part aggregate (revenue "
    "DESC with part-key tie-break), A/B/C classes at the 80/95 cumulative "
    "boundaries with per-class counts and revenue — the stocking-policy "
    "report; windows never touch the fact table",
    tags=("stats", "behavior", "window"),
)
def q_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        dsum("l_extendedprice").alias("r")
    )
    t = rev.agg(
        F.sum(F.col("r").cast(DEC)).cast("double").alias("tr")
    )
    w = Window.orderBy(F.desc("r"), "pk").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = rev.crossJoin(F.broadcast(t)).select(
        "pk",
        "r",
        (
            F.sum(F.col("r").cast(DEC)).over(w).cast("double") / F.col("tr")
        ).alias("cum_share"),
    )
    cls = (
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
    )
    return c.groupBy(cls.alias("abc_class")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(dsum("r"), 6).alias("class_revenue"),
        F.round(F.max("cum_share"), 6).alias("cum_share_ceiling"),
    )


@query(
    "q_quantile_treatment",
    # Quantile treatment effects — the distributional companion to
    # q_ab_welch's mean test ("did the tail move, or just the average?"):
    # per-group discrete deciles (type-1 by integer rank over the value
    # histogram — no interpolation, no float parity risk) for the same
    # even/odd split, reported side by side with the per-decile difference.
    # The histogram windows run on distinct values per group; the decile
    # grid is a bounded 9-way explode of that collapsed frame.
    oracle="""
    WITH h AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END AS grp,
             value AS v, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2),
    w AS (
      SELECT grp, v, cnt,
             SUM(cnt) OVER (PARTITION BY grp ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(cnt) OVER (PARTITION BY grp) AS tot
      FROM h),
    q AS (
      SELECT grp, k.k AS k,
             MIN(CASE WHEN 10 * cum >= k.k * tot THEN v END) AS qv
      FROM w CROSS JOIN range(1, 10) k(k)
      GROUP BY grp, k.k)
    SELECT a.k AS decile, a.qv AS q_treat, b.qv AS q_control,
           ROUND(a.qv - b.qv, 6) AS qte
    FROM q a JOIN q b ON a.k = b.k AND a.grp = 'a' AND b.grp = 'b'
    """,
    description="quantile treatment effects for the even/odd experiment "
    "split: per-group discrete deciles by integer rank over the value "
    "histogram (type-1, no interpolation), reported side by side with the "
    "per-decile difference — answers 'did the tail move or just the mean', "
    "the distributional companion to q_ab_welch; windows on the collapsed "
    "per-group histograms only",
    tags=("stats", "behavior", "window"),
)
def q_quantile_treatment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("grp"),
        F.col("value").alias("v"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("grp")
    wf = h.select(
        "grp",
        "v",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("tot"),
    )
    q = (
        wf.crossJoin(
            F.broadcast(
                wf.sparkSession.range(1, 10).select(F.col("id").alias("k"))
            )
        )
        .groupBy("grp", "k")
        .agg(
            F.min(
                F.when(10 * F.col("cum") >= F.col("k") * F.col("tot"), F.col("v"))
            ).alias("qv")
        )
    )
    a = q.where(F.col("grp") == "a").select(
        F.col("k").alias("decile"), F.col("qv").alias("q_treat")
    )
    b = q.where(F.col("grp") == "b").select(
        F.col("k").alias("decile"), F.col("qv").alias("q_control")
    )
    return a.join(b, "decile").select(
        "decile",
        "q_treat",
        "q_control",
        F.round(F.col("q_treat") - F.col("q_control"), 6).alias("qte"),
    )


@query(
    "q_tail_risk",
    # VaR / CVaR-style tail risk per return flag: the discrete 5th-
    # percentile price (type-1 integer rank over the value histogram — the
    # catalog's interpolation-free quantile rule) and the conditional tail
    # expectation (decimal-exact mean of all values at or below it). The
    # histogram windows run on distinct values; the tail mean is one more
    # conditional aggregate over the same histogram — no second scan of the
    # fact.
    oracle="""
    WITH h AS (
      SELECT l_returnflag AS flag, l_extendedprice AS v, COUNT(*) AS cnt
      FROM lineitem GROUP BY 1, 2),
    w AS (
      SELECT flag, v, cnt,
             SUM(cnt) OVER (PARTITION BY flag ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(cnt) OVER (PARTITION BY flag) AS tot
      FROM h),
    var_ AS (
      SELECT flag, MIN(CASE WHEN 20 * cum >= tot THEN v END) AS var5
      FROM w GROUP BY flag)
    SELECT w.flag,
           var_.var5 AS var_5pct,
           CAST(SUM(CASE WHEN w.v <= var_.var5 THEN w.cnt ELSE 0 END)
                AS BIGINT) AS n_tail,
           ROUND(CAST(SUM(CASE WHEN w.v <= var_.var5
                          THEN CAST(w.v * w.cnt AS DECIMAL(38,6)) END)
                      AS DOUBLE)
                 / SUM(CASE WHEN w.v <= var_.var5 THEN w.cnt ELSE 0 END), 6)
             AS cvar_5pct
    FROM w JOIN var_ ON w.flag = var_.flag
    GROUP BY w.flag, var_.var5
    """,
    description="tail risk per return flag: discrete 5th-percentile value "
    "(VaR, type-1 integer rank — no interpolation) and the conditional tail "
    "expectation at or below it (CVaR, decimal-exact weighted mean) — both "
    "from one value histogram, windows and conditionals on the collapsed "
    "frame, single fact scan",
    tags=("stats", "window"),
)
def q_tail_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    h = li.groupBy(
        F.col("l_returnflag").alias("flag"), F.col("l_extendedprice").alias("v")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("flag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("flag")
    wf = h.select(
        "flag",
        "v",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("tot"),
    )
    var5 = wf.groupBy("flag").agg(
        F.min(F.when(20 * F.col("cum") >= F.col("tot"), F.col("v"))).alias("var5")
    )
    in_tail = F.col("v") <= F.col("var5")
    return (
        wf.join(var5, "flag")
        .groupBy("flag", F.col("var5").alias("var_5pct"))
        .agg(
            F.sum(F.when(in_tail, F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("n_tail"),
            F.round(
                F.sum(
                    F.when(
                        in_tail, (F.col("v") * F.col("cnt")).cast("decimal(38,6)")
                    )
                )
                .cast("double")
                / F.sum(F.when(in_tail, F.col("cnt")).otherwise(0)),
                6,
            ).alias("cvar_5pct"),
        )
    )


@query(
    "q_odds_ratio",
    # The 2x2 odds ratio with its log-scale 95% CI — the effect-size report
    # the chi-square test doesn't give: exposure = promo part type, outcome
    # = line returned. Cells are integer counts from one joined scan;
    # OR = (a·d)/(b·c) on exact bigints through one double division;
    # se(ln OR) = sqrt(1/a + 1/b + 1/c + 1/d) and the CI bounds exp(ln OR
    # ± 1.96·se) are identical-operand double arithmetic on the 1-row cell
    # frame.
    oracle="""
    WITH j AS (
      SELECT (p.p_type LIKE 'PROMO%') AS exposed,
             (l.l_returnflag = 'R') AS outcome
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    c AS (
      SELECT SUM(CASE WHEN exposed AND outcome THEN 1 ELSE 0 END) AS a,
             SUM(CASE WHEN exposed AND NOT outcome THEN 1 ELSE 0 END) AS b,
             SUM(CASE WHEN NOT exposed AND outcome THEN 1 ELSE 0 END) AS c,
             SUM(CASE WHEN NOT exposed AND NOT outcome THEN 1 ELSE 0 END) AS d
      FROM j)
    SELECT CAST(a AS BIGINT) AS n_exp_out, CAST(b AS BIGINT) AS n_exp_noout,
           CAST(c AS BIGINT) AS n_unexp_out, CAST(d AS BIGINT) AS n_unexp_noout,
           ROUND((a * d) / CAST(b * c AS DOUBLE), 6) AS odds_ratio,
           ROUND(exp(ln((a * d) / CAST(b * c AS DOUBLE))
                     - 1.96 * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)), 6)
             AS ci_low,
           ROUND(exp(ln((a * d) / CAST(b * c AS DOUBLE))
                     + 1.96 * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)), 6)
             AS ci_high
    FROM c
    """,
    description="2x2 odds ratio with log-scale 95% CI (exposure = promo part "
    "type, outcome = returned line): integer cells from one joined scan, "
    "OR = ad/bc on exact bigints, Woolf se = sqrt(Σ 1/cell), CI = "
    "exp(ln OR ± 1.96·se) — the effect-size report the chi-square test "
    "doesn't give; all arithmetic on the one-row cell frame",
    tags=("stats", "behavior"),
)
def q_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        li.l_partkey == F.col("p_partkey"),
    ).select(
        F.col("p_type").startswith("PROMO").alias("exposed"),
        (F.col("l_returnflag") == "R").alias("outcome"),
    )
    c = j.agg(
        F.sum(F.when(F.col("exposed") & F.col("outcome"), 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("exposed") & ~F.col("outcome"), 1).otherwise(0)).alias("b"),
        F.sum(F.when(~F.col("exposed") & F.col("outcome"), 1).otherwise(0)).alias("c"),
        F.sum(F.when(~F.col("exposed") & ~F.col("outcome"), 1).otherwise(0)).alias("d"),
    )
    orr = (F.col("a") * F.col("d")) / (F.col("b") * F.col("c")).cast("double")
    se = F.sqrt(
        1.0 / F.col("a") + 1.0 / F.col("b") + 1.0 / F.col("c") + 1.0 / F.col("d")
    )
    return c.select(
        F.col("a").cast("bigint").alias("n_exp_out"),
        F.col("b").cast("bigint").alias("n_exp_noout"),
        F.col("c").cast("bigint").alias("n_unexp_out"),
        F.col("d").cast("bigint").alias("n_unexp_noout"),
        F.round(orr, 6).alias("odds_ratio"),
        F.round(F.exp(F.log(orr) - 1.96 * se), 6).alias("ci_low"),
        F.round(F.exp(F.log(orr) + 1.96 * se), 6).alias("ci_high"),
    )


def _dsum12(col):
    """Order-independent SUM at DECIMAL(38,12) — the embedding-domain twin
    of _util.dsum: element magnitudes are ~1e-1 (products ~1e-2), so the
    house (18,6) scale would quantize away most of the signal; 12 fractional
    digits keep relative error ~1e-10 while staying order-free and
    bit-identical cross-engine. Honors EHS_FAST_SUMS like dsum."""
    from ._util import fast_sums

    c = F.col(col) if isinstance(col, str) else col
    if fast_sums():
        return F.sum(c.cast("double"))
    return F.sum(c.cast("decimal(38,12)")).cast("double")


_D = 64  # embedding dimensionality (TESTDATA.md)


# shared embedding sufficient statistics (q_corr_matrix, q_pca_power_portable)
_MOM_SQL = f"""x AS (
      SELECT vec_id, i.i AS i, CAST(embedding[i.i] AS DOUBLE) AS v
      FROM embeddings CROSS JOIN range(1, {_D + 1}) i(i)),
    marg AS MATERIALIZED (
      SELECT i,
             CAST(SUM(CAST(v AS DECIMAL(38,12))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
             COUNT(*) AS n
      FROM x GROUP BY i),
    prod AS MATERIALIZED (
      SELECT a.i AS i, b.i AS j,
             CAST(SUM(CAST(a.v * b.v AS DECIMAL(38,12))) AS DOUBLE) AS sxy
      FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i < b.i
      GROUP BY a.i, b.i)"""


def _embed_moments(emb: DataFrame):
    """(marg, prod) sufficient statistics of the embedding table — the
    Spark twin of _MOM_SQL: order-free DECIMAL(38,12) sums; pair products
    generated inside the row (no self-join), map-side combinable.

    fan_out (r16): the embeddings table is single-file at test SFs, so the
    2016-way in-row pair-product generate + decimal partial agg otherwise
    runs as ONE task — measured as q_corr_matrix's whole 8.4 s cold wall at
    sf0.1 (idle baseline); decimal sums are order-free, so the repartition
    cannot change a value."""
    emb = fan_out(emb)
    x = emb.select(F.posexplode("embedding").alias("pos", "vf")).select(
        (F.col("pos") + 1).cast("bigint").alias("i"),
        F.col("vf").cast("double").alias("v"),
    )
    marg = x.groupBy("i").agg(
        _dsum12("v").alias("sx"),
        _dsum12(F.col("v") * F.col("v")).alias("sxx"),
        F.count(F.lit(1)).alias("n"),
    )
    pairs = F.expr(
        f"flatten(transform(sequence(0, {_D - 2}), a -> "
        f"transform(sequence(a + 1, {_D - 1}), b -> "
        "struct(CAST(a + 1 AS BIGINT) AS i, CAST(b + 1 AS BIGINT) AS j, "
        "CAST(embedding[a] AS DOUBLE) * CAST(embedding[b] AS DOUBLE) AS xy))))"
    )
    prod = (
        emb.select(F.explode(pairs).alias("p"))
        .select("p.i", "p.j", "p.xy")
        .groupBy("i", "j")
        .agg(_dsum12("xy").alias("sxy"))
    )
    return marg, prod



@query(
    "q_corr_matrix",
    # The feature-correlation matrix — the multivariate screen a feature
    # pipeline runs before training (drop near-duplicate dimensions, spot
    # leaky features): Pearson r for every dimension pair of the embedding
    # table, from one pass of sufficient statistics. Engine parity: per-ROW
    # products are computed float->double then summed ORDER-FREE via
    # DECIMAL(38,12) (the dsum discipline at embedding magnitudes), and the
    # closing r = (n*Sxy - Sx*Sy)/sqrt((n*Sxx - Sx^2)*(n*Syy - Sy^2)) is a
    # fixed sequence of correctly-rounded double ops, so the 6dp result is
    # bit-identical. Scale shape: the d*(d-1)/2 pair products are generated
    # INSIDE the row (nested array transform, no self-join), so the only
    # shuffle is the grouped agg on (i, j) — map-side combinable, carrying
    # exactly 2016 + 64 partial rows per partition regardless of row count;
    # the classic partial-Gram-matrix reduction expressed declaratively.
    oracle=f"""
    WITH {_MOM_SQL}
    SELECT p.i, p.j,
           ROUND((ma.n * p.sxy - ma.sx * mb.sx)
                 / sqrt((ma.n * ma.sxx - ma.sx * ma.sx)
                        * (ma.n * mb.sxx - mb.sx * mb.sx)), 6) AS corr
    FROM prod p JOIN marg ma ON p.i = ma.i JOIN marg mb ON p.j = mb.i
    """,
    description="Pearson feature-correlation matrix over all 2016 embedding-"
    "dimension pairs, hash-checked: order-free DECIMAL(38,12) sufficient "
    "statistics (the dsum discipline at embedding magnitudes), closing "
    "formula a fixed sequence of correctly-rounded double ops; pair products "
    "generated inside the row (no self-join) so the only shuffle carries "
    "2016+64 map-side-combined partial rows per partition — the partial-"
    "Gram-matrix reduction, declaratively; bench-tagged as the round-9 "
    "embedding-linear-algebra representative (decimal-tax story: "
    "EHS_FAST_SUMS erases the DECIMAL(38,12) fold cost)",
    tags=("stats", "vector", "bench"),
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    marg, prod = _embed_moments(emb)
    ma = marg.select(
        F.col("i"), F.col("sx").alias("sx_a"), F.col("sxx").alias("sxx_a"), "n"
    )
    mb = marg.select(
        F.col("i").alias("j"), F.col("sx").alias("sx_b"), F.col("sxx").alias("sxx_b")
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx_a") * F.col("sx_b")) / F.sqrt(
        (F.col("n") * F.col("sxx_a") - F.col("sx_a") * F.col("sx_a"))
        * (F.col("n") * F.col("sxx_b") - F.col("sx_b") * F.col("sx_b"))
    )
    return (
        prod.join(F.broadcast(ma), "i")
        .join(F.broadcast(mb), "j")
        .select("i", "j", F.round(corr, 6).alias("corr"))
    )


def _pca_ctes_sql() -> str:
    steps = []
    for k in (1, 2):
        p = k - 1
        steps.append(f"""
    w{k} AS (
      SELECT a.i,
             CAST(SUM(CAST(a.aij * v{p}.v AS DECIMAL(38,12))) AS DOUBLE) AS wv
      FROM a JOIN v{p} ON a.j = v{p}.i GROUP BY a.i),
    n{k} AS (SELECT sqrt(CAST(SUM(CAST(wv * wv AS DECIMAL(38,12))) AS DOUBLE))
             AS nrm FROM w{k}),
    v{k} AS (SELECT i, wv / nrm AS v FROM w{k} CROSS JOIN n{k})""")
    return (
        f"""
    WITH {_MOM_SQL},
    a AS MATERIALIZED (
      SELECT p.i, p.j,
             (ma.n * p.sxy - ma.sx * mb.sx)
               / (CAST(ma.n AS DOUBLE) * CAST(ma.n AS DOUBLE)) AS aij
      FROM prod p JOIN marg ma ON p.i = ma.i JOIN marg mb ON p.j = mb.i
      UNION ALL
      SELECT p.j AS i, p.i AS j,
             (ma.n * p.sxy - ma.sx * mb.sx)
               / (CAST(ma.n AS DOUBLE) * CAST(ma.n AS DOUBLE)) AS aij
      FROM prod p JOIN marg ma ON p.i = ma.i JOIN marg mb ON p.j = mb.i
      UNION ALL
      SELECT i, i, (n * sxx - sx * sx)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS aij FROM marg),
    v0 AS (SELECT i, CAST(0.125 AS DOUBLE) AS v FROM marg),"""
        + ",".join(steps)
    )


def _pca_power_oracle() -> str:
    return (
        _pca_ctes_sql()
        + """
    SELECT v2.i, ROUND(v2.v, 6) AS loading,
           ROUND(n2.nrm, 6) AS eigval_est
    FROM v2 CROSS JOIN n2
    """
    )


@query(
    "q_pca_power_portable",
    # Distributed PCA, first principal component by POWER ITERATION — the
    # dimensionality-reduction / drift-detection primitive an embedding
    # pipeline runs (which direction carries the variance; project or whiten
    # against it). The covariance matrix comes from the same one-pass
    # sufficient statistics as q_corr_matrix (in-row pair products, no
    # self-join); two unrolled power steps v <- Av/||Av|| then run as
    # matrix-sized joins — A is d^2 rows regardless of corpus size, so each
    # matvec shuffles 64 partials and NOTHING corpus-sized moves after the
    # first agg. Engine parity: every cross-row sum (the matvec and the
    # norm) is an order-free DECIMAL(38,12) fold; v0 = 0.125 is exact
    # dyadic; the remaining ops (divide, sqrt) are correctly-rounded
    # scalars in a fixed sequence — so loadings AND the eigenvalue estimate
    # (||Av|| at the last step) hash-match bit-for-bit.
    oracle=_pca_power_oracle(),
    description="first principal component of the embedding covariance by two "
    "unrolled power-iteration steps, hash-checked: one-pass decimal-exact "
    "sufficient statistics (shared with q_corr_matrix), matrix-sized matvec "
    "joins (d^2 rows independent of corpus size), order-free decimal matvec "
    "and norm folds, exact-dyadic start vector — per-dimension loadings plus "
    "the ||Av|| eigenvalue estimate, bit-identical cross-engine",
    tags=("stats", "vector"),
)
def q_pca_power_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    v, nrm = _pca_top_component(emb)
    return v.crossJoin(F.broadcast(nrm)).select(
        "i",
        F.round("v", 6).alias("loading"),
        F.round("nrm", 6).alias("eigval_est"),
    )


def _pca_top_component(emb: DataFrame):
    """(v, nrm) after two power steps — the Spark twin of _pca_ctes_sql."""
    marg, prod = _embed_moments(emb)
    ma = marg.select("i", F.col("sx").alias("sx_a"), "n")
    mb = marg.select(F.col("i").alias("j"), F.col("sx").alias("sx_b"))
    upper = (
        prod.join(ma, "i")
        .join(mb, "j")
        .select(
            "i",
            "j",
            (
                (F.col("n") * F.col("sxy") - F.col("sx_a") * F.col("sx_b"))
                # n cast to double BEFORE squaring: BIGINT n*n wraps
                # silently past n ~ 3.04e9 rows (non-ANSI mode)
                / (F.col("n").cast("double") * F.col("n").cast("double"))
            ).alias("aij"),
        )
    )
    diag = marg.select(
        "i",
        F.col("i").alias("j"),
        (
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            / (F.col("n").cast("double") * F.col("n").cast("double"))
        ).alias("aij"),
    )
    a = upper.unionByName(
        upper.select(F.col("j").alias("i"), F.col("i").alias("j"), "aij")
    ).unionByName(diag)
    v = marg.select("i", F.lit(0.125).alias("v"))
    nrm = None
    for _ in (1, 2):
        w = (
            a.join(v.select(F.col("i").alias("j"), "v"), "j")
            .groupBy("i")
            .agg(_dsum12(F.col("aij") * F.col("v")).alias("wv"))
        )
        nrm = w.agg(F.sqrt(_dsum12(F.col("wv") * F.col("wv"))).alias("nrm"))
        v = w.crossJoin(F.broadcast(nrm)).select(
            "i", (F.col("wv") / F.col("nrm")).alias("v")
        )
    return v, nrm


@query(
    "q_pca_project",
    # PCA APPLICATION — project every embedding onto the first principal
    # component the power iteration just learned: the score an embedding
    # pipeline uses for drift monitoring, coarse bucketing, or whitening
    # (subtract score·v to deflate). train -> apply symmetry like the
    # tokenizer family. The component is 64 broadcastable rows; the
    # projection is one explode + broadcast join + per-vector order-free
    # DECIMAL(38,12) dot fold — corpus-sized rows move exactly once.
    oracle=_pca_ctes_sql()
    + """
    SELECT x.vec_id,
           ROUND(CAST(SUM(CAST(x.v * v2.v AS DECIMAL(38,12))) AS DOUBLE), 6)
             AS pc1
    FROM x JOIN v2 ON x.i = v2.i
    GROUP BY x.vec_id
    """,
    description="projection of every embedding onto the learned first "
    "principal component (train -> apply for the PCA family): 64-row "
    "broadcast component, one explode + per-vector order-free decimal dot "
    "fold, hash-checked end to end including the power-iteration training",
    tags=("stats", "vector"),
)
def q_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    v, _ = _pca_top_component(emb.select("embedding"))
    x = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "vf")
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("bigint").alias("i"),
        F.col("vf").cast("double").alias("xv"),
    )
    return (
        x.join(F.broadcast(v), "i")
        .groupBy("vec_id")
        .agg(F.round(_dsum12(F.col("xv") * F.col("v")), 6).alias("pc1"))
    )


@query(
    "q_corr_matrix_fast",
    # The PRODUCTION twin of q_corr_matrix (⊘ rows-only by contract, like
    # the murmur3 MinHash fast path): per-partition numpy Gram reduction —
    # one X^T·X matmul per Arrow batch, the shuffle carries d(d+1)/2 + d + 1
    # float64 partials per partition, no per-pair explode, no decimal
    # arithmetic. Float64 accumulation order depends on partitioning, so
    # values are reproducible only to ~1e-12 relative (no SQL twin can
    # bit-match); equivalence to the hash-checked exact twin is pinned by
    # tests/test_operators.py::test_corr_fast_matches_portable_within_fp.
    # Bench evidence: the exploded-decimal exact form pays ~19x DuckDB at
    # sf0.1; this path is the answer a deployment runs.
    oracle=None,
    description="production correlation matrix via per-partition numpy Gram "
    "reduction (MLlib RowMatrix shape, Arrow-side): one matmul per batch, "
    "d(d+1)/2 partials on the wire, no explode, no decimal tax — rows-only "
    "(float accumulation order is partitioning-dependent); tolerance-pinned "
    "against the hash-checked exact twin",
    tags=("stats", "vector", "bench"),
)
def q_corr_matrix_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.linalg import corr_from_gram, gram_moments

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    return corr_from_gram(gram_moments(emb, "embedding", _D))


@query(
    "q_pca_whiten",
    # PCA DEFLATION — the whitening step after q_pca_project: per vector,
    # the first-component score s = x·v and the residual norm
    # |x - s·v| = sqrt(|x|^2 - 2s^2 + s^2|v|^2) — the "how much of this
    # vector is NOT the dominant direction" quantity drift monitors and
    # decorrelation pipelines act on. Every sum (|x|^2, s, |v|^2) is an
    # order-free DECIMAL(38,12) fold; the closing expression is a fixed
    # left-associated sequence of correctly-rounded double ops with a
    # GREATEST(.., 0) guard (a vector exactly on the component can round
    # the radicand epsilon-negative). Corpus-sized rows move once.
    oracle=_pca_ctes_sql()
    + """,
    xs AS (SELECT vec_id,
                  CAST(SUM(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE) AS xx
           FROM x GROUP BY vec_id),
    sc AS (SELECT x.vec_id,
                  CAST(SUM(CAST(x.v * v2.v AS DECIMAL(38,12))) AS DOUBLE) AS s
           FROM x JOIN v2 ON x.i = v2.i GROUP BY x.vec_id),
    vv AS (SELECT CAST(SUM(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE) AS vv
           FROM v2)
    SELECT sc.vec_id,
           ROUND(sc.s, 6) AS pc1,
           ROUND(sqrt(GREATEST(
             xs.xx - 2 * sc.s * sc.s + sc.s * sc.s * vv.vv, 0)), 6)
             AS resid_norm
    FROM sc JOIN xs USING (vec_id) CROSS JOIN vv
    """,
    description="PCA whitening: per-vector first-component score and residual "
    "norm after deflation (|x - s v|) — order-free decimal folds for every "
    "sum, fixed-order closing arithmetic with an epsilon guard, hash-checked "
    "through the power-iteration training; the drift/decorrelation quantity "
    "a feature pipeline monitors",
    tags=("stats", "vector"),
)
def q_pca_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    v, _ = _pca_top_component(emb.select("embedding"))
    x = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "vf")
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("bigint").alias("i"),
        F.col("vf").cast("double").alias("xv"),
    )
    xs = x.groupBy("vec_id").agg(_dsum12(F.col("xv") * F.col("xv")).alias("xx"))
    sc = (
        x.join(F.broadcast(v), "i")
        .groupBy("vec_id")
        .agg(_dsum12(F.col("xv") * F.col("v")).alias("s"))
    )
    vv = v.agg(_dsum12(F.col("v") * F.col("v")).alias("vv"))
    radicand = (
        F.col("xx")
        - F.lit(2) * F.col("s") * F.col("s")
        + F.col("s") * F.col("s") * F.col("vv")
    )
    return (
        sc.join(xs, "vec_id")
        .crossJoin(F.broadcast(vv))
        .select(
            "vec_id",
            F.round("s", 6).alias("pc1"),
            F.round(F.sqrt(F.greatest(radicand, F.lit(0.0))), 6).alias("resid_norm"),
        )
    )


@query(
    "q_pca_power_fast",
    # Production twin of q_pca_power_portable (⊘ rows-only, the
    # q_corr_matrix_fast pattern): sufficient statistics from the
    # per-partition numpy Gram reduction, power steps over the d^2-row
    # covariance with plain double sums. Tolerance-pinned against the
    # hash-checked portable twin in tests/test_operators.py (loadings
    # agree to float rounding; sign is fixed by the shared positive start
    # vector).
    oracle=None,
    description="production PCA: power iteration over the numpy partial-Gram "
    "covariance (no explode, no decimal arithmetic) — rows-only twin of the "
    "hash-checked q_pca_power_portable, tolerance-pinned against it",
    tags=("stats", "vector"),
)
def q_pca_power_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.linalg import gram_moments, pca_power_from_gram

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    v, nrm = pca_power_from_gram(gram_moments(emb, "embedding", _D), _D, 2)
    return v.crossJoin(F.broadcast(nrm)).select(
        F.col("i").cast("bigint").alias("i"),
        F.round("v", 6).alias("loading"),
        F.round("nrm", 6).alias("eigval_est"),
    )
