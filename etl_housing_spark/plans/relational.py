"""Relational core of the query catalog (SURVEY.md §2.1-2.7, §2.11).

Each query id carries: the Spark-first implementation (lazy DataFrame
expressions, Catalyst-optimizable end to end) and the ANSI-SQL oracle string
DuckDB executes on the same parquet tables. Reference provenance is cited
per query (file:line into /root/reference).

Scale notes are inline: every join states its strategy, every aggregate is
partial+final, every checked query ends deterministic (explicit keys or
order-insensitive sets).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, ts_lit
from ._util import davg, dsum, sql_davg, sql_dsum
from .registry import query

# --------------------------------------------------------------------------
# Flagship: TPC-H-Q1-shaped pricing summary. Exercises scan → filter →
# project → group-agg → sort in one plan (SURVEY.md §7.1). The groupBy
# aggregation is a two-phase HashAggregate (map-side partial combine), so at
# 100 TB the shuffle carries only |groups| × |aggs| rows per partition.
# --------------------------------------------------------------------------


@query(
    "q_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1-shaped pricing summary (flagship; scan+filter+agg+sort)",
    tags=("agg", "bench"),
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= ts_lit(li, "l_shipdate", "2000-12-01 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Projections / filters (SURVEY §2.2; reference trulia_scrape.py:161,169,
# load_save_sql.ipynb cells 3-5, mongo.ipynb cell 9)
# --------------------------------------------------------------------------


@query(
    "q_project",
    oracle="SELECT o_orderkey, o_custkey, o_totalprice FROM orders",
    description="column projection + drop (P1/P2; load_save_sql.ipynb:39,228) — pruned scan",
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    # select-then-drop mirrors the reference's explicit column list followed
    # by drop(columns='apt_id'); Catalyst collapses both into one ReadSchema.
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .drop("o_orderstatus")
    )


@query(
    "q_filter_eq",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE c_mktsegment = 'BUILDING'
    """,
    description="equality predicate (P5; mongo.ipynb find author='Bill') — pushed to scan",
)
def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", "c_acctbal")
    )


@query(
    "q_filter_ne",
    oracle="SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus <> 'O'",
    description="!= predicate (P3; trulia_scrape.py:161 sqft != '')",
)
def q_filter_ne(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") != "O")
        .select("o_orderkey", "o_orderstatus")
    )


@query(
    "q_filter_notcontains",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE NOT COALESCE(contains(text, 'vector'), FALSE)
    """,
    description="negated contains with explicit null-handling (P4; trulia_scrape.py:169 ~contains('-'), na=False)",
)
def q_filter_notcontains(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # reference: df[~df.price.str.contains('-', na=False)] — NULL text must
    # survive the filter as the pandas na=False kwarg dictates
    return docs.filter(
        ~F.coalesce(F.col("text").contains("vector"), F.lit(False))
    ).select("doc_id", "lang")


@query(
    "q_masked_update",
    oracle="""
    SELECT p_partkey,
           CASE WHEN p_size > 25 THEN p_retailprice * 1.1 ELSE p_retailprice END AS adj_price
    FROM part
    """,
    description="conditional masked update (P6; trulia_scrape.py:162-163 df.loc[mask]=...)",
)
def q_masked_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.when(F.col("p_size") > 25, F.col("p_retailprice") * 1.1)
        .otherwise(F.col("p_retailprice"))
        .alias("adj_price"),
    )


# --------------------------------------------------------------------------
# Aggregations (SURVEY §2.4)
# --------------------------------------------------------------------------


@query(
    "q_count",
    oracle="SELECT COUNT(*) AS n FROM lineitem",
    description="row count (A3; trulia_scrape.py:200 len(...))",
)
def q_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_groupby_avg",
    oracle=f"""
    SELECT o_orderpriority,
           {sql_davg('o_totalprice')} AS avg_total,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    description="grouped avg+count (A5; 0-ToDo.md:49 'SQL Stats' — avg price per group)",
    tags=("bench",),
)
def q_groupby_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(davg("o_totalprice").alias("avg_total"), F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "q_agg_stats",
    oracle=f"""
    SELECT {sql_davg('c_acctbal')} AS mean_bal,
           round(sqrt({sql_dsum('c_acctbal * c_acctbal')} / COUNT(c_acctbal)
                 - pow({sql_davg('c_acctbal')}, 2)), 6) AS std_bal,
           COUNT(c_acctbal) AS n
    FROM customer
    """,
    description="mean+stddev profile (A2/A4; np.mean/np.std trulia_csv_to_nlp.ipynb cell 29). "
    "stddev via exact decimal sums of x and x². The sum-of-squares decimal exceeds 2^53 "
    "in unscaled units beyond ~sf0.05, where decimal→double conversion may differ by "
    "1 ulp between engines — std_bal is rounded to 6 dp on both sides so the checked "
    "value is conversion-independent at every scale factor",
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = F.col("c_acctbal")
    mean = davg(c)
    return load_table(spark, sf_dir, "customer").agg(
        mean.alias("mean_bal"),
        F.round(F.sqrt(dsum(c * c) / F.count(c) - F.pow(mean, F.lit(2))), 6).alias("std_bal"),
        F.count(c).alias("n"),
    )


@query(
    "q_distinct",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    description="distinct (A6; dedup TODO 0-ToDo.md:54)",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "q_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    description="rollup hierarchy totals (A7)",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"))
    )


# --------------------------------------------------------------------------
# Sorts / limits / top-k / sampling (SURVEY §2.6)
# --------------------------------------------------------------------------


@query(
    "q_sort",
    oracle="SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey",
    description="full sort desc (O1/O2; sort_values cells 17,35) — range-partitioned exchange at scale",
)
def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
    )


@query(
    "q_limit",
    oracle="SELECT o_orderkey, o_orderdate FROM orders ORDER BY o_orderkey LIMIT 10",
    description="head/limit with deterministic order (O4; df.head() cell 19)",
)
def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate")
        .orderBy("o_orderkey")
        .limit(10)
    )


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    description="top-k (O6; ranked coefficients cells 35-36) — TakeOrderedAndProject, no full sort",
    tags=("bench",),
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


@query(
    "q_sample",
    oracle=None,  # nondeterministic across engines — rows-only check (⊘, O5)
    description="random sample, seeded (O5; df.sample(10) cells 9,16)",
)
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").sample(fraction=0.1, seed=42)


# --------------------------------------------------------------------------
# Set operations (SURVEY §2.7; U1/U2 pd.concat & df.append)
# --------------------------------------------------------------------------


@query(
    "q_union_all",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    description="union-all accumulation (U1/U2; pd.concat cell 8, df.append cell 6)",
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", "o_orderstatus")
    a = o.filter(F.col("o_orderstatus") == "F").drop("o_orderstatus")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").drop("o_orderstatus")
    return a.unionByName(b)


@query(
    "q_except",
    oracle="""
    SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_orderkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    description="set difference (U3; anti-join shape of the dedup TODO)",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    b = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_orderkey")
    return a.subtract(b)


# --------------------------------------------------------------------------
# Joins (SURVEY §2.3 — declared capability; the reference has none).
# Strategy is explicit per query: broadcast for small dims, sort-merge for
# fact-fact; at 100 TB the broadcast avoids shuffling the fact table
# entirely, and SMJ shuffles both sides exactly once on the join key.
# --------------------------------------------------------------------------


@query(
    "q_join_broadcast",
    oracle=f"""
    SELECT p.p_brand, {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand ORDER BY p.p_brand
    """,
    description="broadcast hash equi-join fact⋈dim (lineitem⋈part) + grouped revenue",
    tags=("join", "bench"),
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "inner")
        .groupBy("p_brand")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("p_brand")
    )


@query(
    "q_join_sortmerge",
    oracle=f"""
    SELECT o.o_orderpriority, COUNT(*) AS n_items, {sql_dsum('l.l_quantity')} AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
    description="shuffle sort-merge join fact⋈fact (lineitem⋈orders, MERGE hint) — "
    "the large-large strategy that scales when neither side broadcasts",
    tags=("join", "bench"),
)
def q_join_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    return (
        li.hint("merge")
        .join(o, li.l_orderkey == o.o_orderkey, "inner")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_items"), dsum("l_quantity").alias("sum_qty"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 50000)
    """,
    description="left-semi join: customers having a big order (S13/D1 building block)",
    tags=("join",),
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 50000)
    return c.join(o, c.c_custkey == o.o_custkey, "leftsemi").select("c_custkey", "c_name")


@query(
    "q_join_anti",
    # the unfiltered form ("no orders at all") is vacuously empty on this
    # data — every customer orders; the big-order predicate keeps the
    # anti-join exercised with real survivors at every SF
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    description="left-anti join: customers with no large order (>300k)",
    tags=("join",),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select("o_custkey")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "leftanti").select("c_custkey", "c_name")


@query(
    "q_upsert_antijoin",
    oracle="""
    WITH updates AS (
      SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal
      FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT c_custkey, c_acctbal FROM updates
    UNION ALL
    SELECT c.c_custkey, c.c_acctbal FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
    """,
    description="MERGE-style upsert as anti-join + union (S13 mongoengine .save(); fixes the "
    "duplicate-append flaw of load_save_sql.ipynb:228). Plain-Spark form of Delta MERGE INTO",
    tags=("join",),
)
def q_upsert_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    target = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    updates = target.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", (F.col("c_acctbal") + 100.0).alias("c_acctbal")
    )
    kept = target.join(updates.select("c_custkey"), "c_custkey", "leftanti")
    return updates.unionByName(kept)


# --------------------------------------------------------------------------
# Window functions (SURVEY §2.5 — declared for top-k-per-group analytics)
# --------------------------------------------------------------------------


@query(
    "q_window_rank",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
    description="top-3 per group via row_number (W; 'top-k cheapest per zipcode' analog)",
    tags=("window", "bench"),
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
    FROM orders
    """,
    description="running total per customer (W; cumulative frame). Decimal accumulation "
    "keeps the running sum exact and engine-independent",
    tags=("window",),
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(38,2)")).over(w).cast("double").alias("running_total"),
    )


# --------------------------------------------------------------------------
# Reshape / encode (SURVEY §2.9 — get_dummies / pivot)
# --------------------------------------------------------------------------

_STATUSES = ["F", "O", "P"]


@query(
    "q_onehot_pivot",
    oracle="""
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
    FROM orders GROUP BY o_orderpriority
    """,
    description="one-hot/pivot on column values (R2; pd.get_dummies cell 18) with a fixed "
    "vocabulary — the two-pass dynamic form lives in operators.encode.get_dummies",
)
def q_onehot_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    pivoted = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", _STATUSES)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL where a (group, value) pair is absent; COUNT(CASE) gives 0
    return pivoted.select(
        "o_orderpriority",
        *[F.coalesce(F.col(s), F.lit(0)).alias(s) for s in _STATUSES],
    )


# --------------------------------------------------------------------------
# Streaming-shaped batch forms (SURVEY §2.11) — the streaming/ package runs
# the same aggregations via readStream+availableNow; these batch forms are
# the oracle-checkable half of the batch⇄stream equivalence pair.
# --------------------------------------------------------------------------


@query(
    "q_window_tumbling",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events GROUP BY 1, 2
    """,
    description="tumbling 1h window agg (daily scrape volume analog; cron evidence "
    "logs/scraper.log:827-842). Batch twin of streaming.jobs.tumbling_counts",
    tags=("window", "bench"),
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


@query(
    "q_window_sliding",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) - (k.k * INTERVAL '15 minutes') AS window_start,
           COUNT(*) AS n_events
    FROM events, range(0, 4) k(k)
    GROUP BY 1
    """,
    description="sliding 1h/15m window counts — each event lands in 4 overlapping windows; "
    "oracle expands the overlap with a range join",
    tags=("window",),
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_id, CAST(regexp_extract(props, '"k":\\s*([0-9]+)', 1) AS INTEGER) AS k
    FROM events
    """,
    description="JSON field extraction (advanced.ipynb:104-117 payload traversal; "
    "events.props is the JSON column)",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


# --------------------------------------------------------------------------
# Partitioned CSV round-trip (S3/S4: daily_scrape/{city}/{date}.csv).
# Values survive the round-trip, so the oracle is simply the source table —
# a genuine value-checked test of the partitioned sink+source.
# --------------------------------------------------------------------------


@query(
    "q_csv_roundtrip",
    oracle="SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders",
    description="partitioned CSV sink + partition-discovery source round-trip "
    "(S3/S4; trulia_scrape.py:182-188 + trulia_csv_to_nlp.ipynb cells 6-8)",
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.partitioned_csv import read_partitioned_csv, write_partitioned_csv

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    out = tempfile.mkdtemp(prefix="ehs_csv_rt_")
    # partition column analog of {city}/{date}: o_orderstatus directories
    write_partitioned_csv(o, out, partition_cols=["o_orderstatus"])
    back = read_partitioned_csv(spark, out, data_schema="o_orderkey BIGINT, o_orderpriority STRING")
    return back.select("o_orderkey", "o_orderstatus", "o_orderpriority")


@query(
    "q_jsonl_roundtrip",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents",
    description="JSONL (JSON-Lines) sink + schema-pinned source round-trip over the "
    "document corpus, partitioned by source — the interchange format every "
    "public training-corpus dump ships in. Values (including arbitrary text "
    "via JSON escaping) survive bit-exact; the read pins an explicit schema "
    "so no inference pass touches the archive, and the source partition "
    "column returns via directory discovery (pruning-capable at scale)",
    tags=("source",),
)
def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.formats import read_jsonl, write_jsonl

    docs = load_table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="ehs_jsonl_rt_")
    write_jsonl(docs, out, partition_cols=["source"])
    back = read_jsonl(
        spark,
        out,
        data_schema="doc_id BIGINT, text STRING, lang STRING, n_chars BIGINT",
        base_path=out,
    )
    return back.select("doc_id", "text", "lang", "source", "n_chars")


@query(
    "q_orc_roundtrip",
    oracle="SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders",
    description="ORC sink + source round-trip (the columnar archive tier for "
    "Hive/Trino-standard warehouses): stripe-splittable, pushdown-capable, "
    "doubles round-trip binary-exact",
    tags=("source",),
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.formats import read_orc, write_orc

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    out = tempfile.mkdtemp(prefix="ehs_orc_rt_")
    write_orc(o, out)
    return read_orc(
        spark, out, data_schema="o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE"
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@query(
    "q_jdbc_roundtrip",
    # S6/S7 carried by VALUE, not just by test (VERDICT r12 #8): the
    # nation dim rides write_jdbc -> embedded Derby -> read_jdbc and comes
    # back with a Catalyst-pushed predicate, then hash-matches the oracle
    # computed straight off the parquet view — so the JDBC relation is
    # proven value-preserving AND pushdown-capable in the registered
    # surface (plan-asserted in tests/test_plan_quality.py; the sqlite
    # DIALECT remains the documented jar boundary, load_save_sql.ipynb:
    # 57-86). Integer and string columns only: exact round-trip, no float
    # boundary. Derby is per-(sf_dir, pid) scratch, overwritten per call.
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey < 2
    """,
    description="JDBC round-trip with predicate pushdown (S6 SELECT w/ column "
    "list + S7 sink): the nation dim written through df.write.jdbc into an "
    "embedded Derby warehouse and read back via spark.read.jdbc with the "
    "region predicate pushed into the generated SQL (PushedFilters, plan-"
    "asserted) — the dimension-table ingest/export pattern against an "
    "operational RDBMS; at 100 TB the JDBC tier carries dims and metadata "
    "(partitioned by predicate ranges), never facts",
    tags=("source",),
)
def q_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.warehouse import read_jdbc, write_jdbc

    derby = "org.apache.derby.jdbc.EmbeddedDriver"
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    url = f"jdbc:derby:{_stable_tmp('ehs_jdbc_rt', sf_dir)}/nationdb;create=true"
    write_jdbc(nation, url, "nation_rt", mode="overwrite", driver=derby)
    back = read_jdbc(spark, url, "nation_rt", driver=derby)
    return back.filter(F.col("n_regionkey") < 2).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


# --------------------------------------------------------------------------
# Physical-layout techniques: bucketed co-located join and partition-pruned
# scan. These are the two table-layout levers that matter most at 100 TB —
# pre-shuffling fact tables once at write time so every subsequent join is
# exchange-free, and directory-partitioning on the query-predicate column so
# a one-day query reads one directory. Both are proven by value (oracle on
# the logical result) AND by plan (tests/test_plan_quality.py asserts zero
# Exchange / non-empty PartitionFilters respectively).
# --------------------------------------------------------------------------


_SCRATCH_DIRS: set[str] = set()


def _reap_scratch_dirs() -> None:
    """atexit: remove every scratch dir this process created — a
    test/bench fleet otherwise accumulates one corpus-sized copy per
    process in the system tempdir (the _two_batch_replay leak class,
    round-4 fix; ADVICE r11 flagged the same for these layout dirs)."""
    import shutil

    while _SCRATCH_DIRS:
        shutil.rmtree(_SCRATCH_DIRS.pop(), ignore_errors=True)


def _host_token() -> str:
    """Short stable token for THIS host, embedded in scratch suffixes so
    catalog hygiene can tell same-host entries (whose liveness the local
    filesystem can answer) from other hosts' (which it cannot)."""
    import hashlib
    import socket

    return hashlib.md5(socket.gethostname().encode()).hexdigest()[:6]


def _stable_tmp(prefix: str, sf_dir: str) -> str:
    """Stable scratch dir per (prefix, sf_dir, host, process): repeated
    invocations (value check + plan test + every bench repetition)
    OVERWRITE the same location instead of leaking a fresh mkdtemp copy of
    the table each call; the host+pid suffix keeps concurrent sessions —
    including same-pid sessions on DIFFERENT hosts sharing a metastore —
    from clobbering each other mid-read. Every dir is registered for
    atexit removal so the per-process uniqueness never turns into tempdir
    accumulation across a fleet of test/bench processes."""
    import atexit
    import hashlib
    import os

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(
        tempfile.gettempdir(), f"{prefix}_{tag}_{_host_token()}_{os.getpid()}"
    )
    os.makedirs(path, exist_ok=True)
    if not _SCRATCH_DIRS:
        atexit.register(_reap_scratch_dirs)
    _SCRATCH_DIRS.add(path)
    return path


def _save_bucketed(
    df: DataFrame, name: str, key: str, sf_dir: str, n_buckets: int = 8
) -> DataFrame:
    """Write ``df`` as a parquet table bucketed (and per-bucket sorted) on
    ``key``, then return the catalog-backed read. Bucket metadata lives in
    the session catalog (Spark cannot recover bucketing from bare files),
    so the read goes through ``spark.table``. External location at a
    stable per-(sf_dir, process) path — mode("overwrite") replaces the
    prior contents, so reruns don't accumulate copies. The CATALOG name
    carries the same per-process suffix as the path: two sessions sharing
    a metastore would otherwise race on DROP TABLE/saveAsTable even with
    distinct data paths (ADVICE r11)."""
    import os

    spark = df.sparkSession
    path = _stable_tmp(name, sf_dir)
    table = f"{name}_{os.path.basename(path).rsplit(name + '_', 1)[-1]}"
    # sweep DANGLING entries from earlier processes: their per-pid names
    # are never dropped by this process's DROP and the atexit reaper
    # removes only their data dirs — a shared metastore would otherwise
    # accumulate one missing-path table definition per past process. A
    # stale entry is one whose scratch dir is gone; live concurrent
    # sessions' dirs exist, so they are never touched (race-free). The
    # sweep is scoped to entries this host's filesystem can JUDGE: new-
    # format names carrying THIS host's token, plus legacy pre-host-token
    # names ({name}_{tag}_{pid} — created before suffixes were host-
    # qualified, when every entry was implicitly local; without this
    # branch they would orphan forever). An entry carrying a DIFFERENT
    # host's token is never touched — a live remote session's table has
    # no local dir, so judging it here would drop it mid-read (ADVICE r12).
    host = _host_token()
    for row in spark.sql(f"SHOW TABLES LIKE '{name}_*'").collect():
        other = row.tableName
        parts = other[len(name) + 1 :].split("_")
        local = (len(parts) >= 3 and parts[-2] == host) or len(parts) == 2
        if (
            other != table
            and local
            and not os.path.isdir(os.path.join(tempfile.gettempdir(), other))
        ):
            spark.sql(f"DROP TABLE IF EXISTS {other}")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.write.mode("overwrite")
        .option("path", path)
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )
    return spark.table(table)


@query(
    "q_bucketed_join",
    oracle=f"""
    SELECT o.o_orderkey, o.o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {sql_dsum('l.l_quantity')} AS sum_qty
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_custkey
    """,
    description="bucketed co-located join: orders and lineitem written once as "
    "parquet tables bucketed (and per-bucket sorted) on the join key, then "
    "joined AND aggregated with ZERO exchanges — the sort-merge join reads "
    "matching buckets side by side, and the per-order aggregate reuses the "
    "same hash partitioning (bucket key is a subset of the grouping key). "
    "This is the amortize-the-shuffle-at-write-time layout every recurring "
    "100 TB fact-to-fact join wants: pay one distribution when data lands, "
    "run every later join/agg on it shuffle-free. Value-checked against the "
    "plain logical join; plan-checked exchange-free in test_plan_quality",
    tags=("source",),
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    bo = _save_bucketed(o, "ehs_bucketed_orders", "o_orderkey", sf_dir)
    bl = _save_bucketed(li, "ehs_bucketed_lineitem", "l_orderkey", sf_dir)
    # MERGE hint: at fixture scale AQE would broadcast the small side, which
    # hides the layout property under test. A 100 TB fact-to-fact join can
    # never broadcast — force the sort-merge strategy so the plan is the
    # deployment-shaped one (bucket-aligned SMJ, zero exchanges) at every SF.
    return (
        bo.hint("merge")
        .join(bl, bo["o_orderkey"] == bl["l_orderkey"])
        .groupBy("o_orderkey", "o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity").alias("sum_qty"),
        )
    )


@query(
    "q_compact_files",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents",
    description="small-files compaction (the OPTIMIZE / bin-packing maintenance "
    "op every streaming-ingested lakehouse table needs): a deliberately "
    "fragmented 64-file copy of the corpus is rewritten into "
    "ceil(bytes / 128 MiB) right-sized files — file count computed from the "
    "actual on-disk bytes, so the target tracks data, not row counts. At "
    "100 TB the small-files problem is a listing/task-overhead killer "
    "(one scan task per tiny file); compaction restores "
    "maxPartitionBytes-sized splits. Values survive both rewrites "
    "bit-exact (the oracle is the source table); the file-count contract "
    "is pinned in tests/test_sources.py",
    tags=("source",),
)
def q_compact_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    docs = load_table(spark, sf_dir, "documents")
    small = _stable_tmp("ehs_smallfiles", sf_dir)
    # the pathological ingest state: 64 tiny files
    docs.repartition(64).write.mode("overwrite").parquet(small)
    back = spark.read.parquet(small)
    # size via the Hadoop FileSystem API, not a driver-local glob: on
    # HDFS/S3 a local glob silently returns nothing and the target would
    # collapse to 1 — the wrong compaction with no error (ADVICE r11).
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(small)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jpath).getLength()
    if total <= 0:
        raise RuntimeError(
            f"compaction source {small!r} lists as empty — filesystem/"
            "path mismatch; refusing to compute a bogus file target"
        )
    target = max(1, math.ceil(total / (128 << 20)))
    out = _stable_tmp("ehs_compacted", sf_dir)
    back.repartition(target).write.mode("overwrite").parquet(out)
    return spark.read.parquet(out).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


@query(
    "q_partition_prune",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('value')} AS sum_value
    FROM events
    WHERE CAST(ts AS DATE) = (SELECT MIN(CAST(ts AS DATE)) FROM events)
    GROUP BY event_type
    """,
    description="partition-pruned scan: the event stream written "
    "directory-partitioned by day (the universal fact-table layout), then a "
    "one-day aggregate reads exactly ONE partition directory — the filter "
    "binds at file listing time (PartitionFilters in the scan, asserted in "
    "test_plan_quality), so a day query over a 100 TB / 3-year table touches "
    "~0.1% of the files before a single row is decoded. The probe date is "
    "the corpus min-date, resolved by a partition-metadata-only aggregate",
    tags=("source",),
)
def q_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn("d", F.to_date("ts"))
    out = _stable_tmp("ehs_partprune", sf_dir)
    ev.write.mode("overwrite").partitionBy("d").parquet(out)
    back = spark.read.parquet(out)
    # partition-column min: resolved from directory metadata, no row decode
    dmin = back.agg(F.min("d")).collect()[0][0]
    return (
        back.filter(F.col("d") == F.lit(dmin))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("sum_value"),
        )
    )


@query(
    "q_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    description="cube: all grouping-set combinations (A7 companion to q_rollup) — "
    "one Expand + one HashAggregate, still partial+final at scale",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"))
    )


@query(
    "q_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    description="set intersection (U3): customers with both finished and open orders — "
    "left-semi under the hood, no full materialization",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b)


@query(
    "q_approx_distinct",
    oracle=None,  # HLL sketches are engine-specific — rows-only ⊘; the exact
    # twin q_distinct is the hash-checked one. tests/test_approx.py bounds the
    # relative error instead.
    description="approx_count_distinct (A6 scale path): HLL sketch, one pass, "
    "mergeable partials — the 100 TB answer when exact distinct's shuffle "
    "isn't worth it",
    tags=("agg",),
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
    )


@query(
    "q_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
           round(quantile_cont(o_totalprice, 0.95), 6) AS p95_price,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    description="exact grouped percentiles (A2/A4 profile surface): percentile_cont "
    "interpolation — identical sorted-interpolation semantics on both engines; "
    "rounded 6dp so the one interpolation multiply is conversion-independent. "
    "At 100 TB switch to approx_percentile (t-digest, mergeable partials)",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median_price"),
            F.round(F.expr("percentile(o_totalprice, 0.95)"), 6).alias("p95_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_percentile_sketch",
    oracle=None,  # approximate by construction (mergeable sketch) — rows-only (⊘);
    # error bound vs the exact q_percentiles asserted in tests/test_approx.py
    description="approx grouped percentiles via percentile_approx — the 100 TB scale "
    "path q_percentiles' docstring promises: mergeable partial sketches, one "
    "partial+final aggregate, memory bounded by the accuracy parameter instead "
    "of the group's row count (exact percentile buffers every value per group)",
)
def q_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    acc = 10_000  # max rank error ≈ n/acc
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(F.percentile_approx("o_totalprice", 0.5, acc), 6).alias("median_price"),
            F.round(F.percentile_approx("o_totalprice", 0.95, acc), 6).alias("p95_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_string_agg",
    oracle="""
    SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
    description="ordered string aggregation (R-family reshape; the ' ,'.join(details) "
    "shape lifted to groups): sort_array(collect_list) + array_join — deterministic "
    "because the collected set is sorted before joining",
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"))
        .orderBy("n_regionkey")
    )


@query(
    "q_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 20000) AS BIGINT) AS bucket,
           COUNT(*) AS n
    FROM orders GROUP BY bucket ORDER BY bucket
    """,
    description="histogram binning (A4 profile surface): fixed-width floor-division "
    "buckets + count — one partial+final aggregate, the distributed form of "
    "df.hist/df.describe (pure arithmetic binning: identical IEEE division on "
    "both engines; width_bucket is absent from the oracle's DuckDB build)",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(F.floor(F.col("o_totalprice") / 20000).cast("bigint").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# GROUPING SETS — the explicit form completing the rollup/cube family
# (A7): independent status-wise and priority-wise summaries plus the grand
# total in a single scan. One Expand (3 replicas) + one partial+final
# HashAggregate; at 100 TB this reads the fact table once instead of three
# times — the whole point of grouping sets over UNION ALL of group-bys.
# --------------------------------------------------------------------------


@query(
    "q_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    description="explicit GROUPING SETS (A7 family): status-wise + priority-wise + grand "
    "total in one scan — Expand + single partial+final HashAggregate, 1 read "
    "instead of 3",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


# --------------------------------------------------------------------------
# IQR outlier detection — the distributed form of the price-sanity eyeball
# checks the reference does by sorting and looking (trulia_csv_to_nlp.ipynb
# cell 17) and its range-price filters (trulia_scrape.py:169). Tukey fences
# per group: percentiles are rounded to 6dp *first* (the one cross-engine
# interpolation wobble, same rationale as q_percentiles), then every
# downstream fence computation is exactly-rounded IEEE arithmetic on
# identical operands — the filter predicate is bit-deterministic on both
# engines. Plan: tiny per-group fence table broadcast back onto the fact
# scan; at 100 TB the fences come from approx_percentile instead and the
# shape is unchanged.
# --------------------------------------------------------------------------


@query(
    "q_outlier_iqr",
    oracle="""
    WITH f AS (
      SELECT event_type,
             round(quantile_cont(value, 0.25), 6) AS q1,
             round(quantile_cont(value, 0.75), 6) AS q3
      FROM events GROUP BY event_type),
    b AS (
      SELECT event_type, q1 - CAST(1.5 AS DOUBLE) * (q3 - q1) AS lo,
             q3 + CAST(1.5 AS DOUBLE) * (q3 - q1) AS hi
      FROM f)
    SELECT e.event_id, e.event_type, e.value
    FROM events e JOIN b USING (event_type)
    WHERE e.value < b.lo OR e.value > b.hi
    """,
    description="per-group Tukey-fence (1.5·IQR) outlier rows — grouped percentiles "
    "rounded 6dp then exact IEEE fence arithmetic; fence table broadcast onto "
    "the fact scan",
    tags=("agg",),
)
def q_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    fences = (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.25)"), 6).alias("q1"),
            F.round(F.expr("percentile(value, 0.75)"), 6).alias("q3"),
        )
        .select(
            "event_type",
            (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
            (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
        )
    )
    return (
        ev.join(F.broadcast(fences), "event_type")
        .filter((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")))
        .select("event_id", "event_type", "value")
    )


# --------------------------------------------------------------------------
# Stratified sampling — the per-class downsampling every training-corpus
# builder runs (class rebalancing, eval-split carving). sampleBy is a
# map-only Bernoulli filter per stratum: no shuffle, no state, linear scan —
# the only sampling pattern that works at 100 TB. Seeded but ⊘ rows-only:
# Spark's per-row hash stream is engine-specific by design.
# --------------------------------------------------------------------------


@query(
    "q_stratified_sample",
    oracle=None,  # sampling hash stream is engine-specific — rows-only (⊘)
    description="stratified per-class sampling (sampleBy, seeded): map-only Bernoulli "
    "filter per stratum, shuffle-free — class rebalancing at corpus scale",
    tags=("sample",),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    fractions = {"click": 0.1, "view": 0.1, "purchase": 1.0, "signup": 1.0, "error": 0.5}
    return ev.sampleBy("event_type", fractions, seed=7)


# --------------------------------------------------------------------------
# SCD2 merge — versioned-dimension history. The reference overwrites or
# duplicates on every daily run (to_sql(if_exists='append'),
# load_save_sql.ipynb:228) and never solved cross-run identity
# (0-ToDo.md:54); scraping the same apartment daily therefore loses its
# price history. sources.warehouse.scd2_merge is the warehouse fix: every
# business key carries [valid_from, valid_to) versions. The checked query
# runs one full merge cycle over customer: segment changes for custkey%7
# (close + reopen), brand-new keys (insert), everything else untouched.
# --------------------------------------------------------------------------


@query(
    "q_scd2_merge",
    oracle="""
    WITH cur AS (
      SELECT c_custkey, c_mktsegment,
             TIMESTAMP '2020-01-01 00:00:00' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
      FROM customer),
    upd AS (
      SELECT c_custkey, 'PROMO' AS c_mktsegment FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT c_custkey + 1000000, 'NEWSEG' FROM customer WHERE c_custkey % 97 = 0),
    changed AS (
      SELECT cur.c_custkey, upd.c_mktsegment AS new_seg
      FROM cur JOIN upd ON cur.c_custkey = upd.c_custkey
      WHERE cur.c_mktsegment IS DISTINCT FROM upd.c_mktsegment),
    newkeys AS (
      SELECT upd.c_custkey, upd.c_mktsegment
      FROM upd LEFT JOIN cur ON upd.c_custkey = cur.c_custkey
      WHERE cur.c_custkey IS NULL)
    SELECT cur.c_custkey, cur.c_mktsegment, cur.valid_from,
           CASE WHEN ch.c_custkey IS NOT NULL
                THEN TIMESTAMP '2024-06-01 00:00:00' END AS valid_to,
           ch.c_custkey IS NULL AS is_current
    FROM cur LEFT JOIN changed ch ON cur.c_custkey = ch.c_custkey
    UNION ALL
    SELECT c_custkey, new_seg, TIMESTAMP '2024-06-01 00:00:00', NULL, TRUE FROM changed
    UNION ALL
    SELECT c_custkey, c_mktsegment, TIMESTAMP '2024-06-01 00:00:00', NULL, TRUE FROM newkeys
    """,
    description="SCD2 versioned-dimension merge (close-changed + insert-new + pass-through "
    "unchanged) over customer — warehouse history maintenance the reference's "
    "append-only sink lacks; open-slice equi-join + unions, archive rows untouched",
    tags=("warehouse",),
)
def q_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.warehouse import scd2_merge

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    current = (
        cust.withColumn("valid_from", F.lit("2020-01-01 00:00:00").cast("timestamp_ntz"))
        .withColumn("valid_to", F.lit(None).cast("timestamp_ntz"))
        .withColumn("is_current", F.lit(True))
    )
    updates = (
        cust.filter(F.col("c_custkey") % 7 == 0)
        .select("c_custkey", F.lit("PROMO").alias("c_mktsegment"))
        .unionByName(
            cust.filter(F.col("c_custkey") % 97 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                F.lit("NEWSEG").alias("c_mktsegment"),
            )
        )
    )
    return scd2_merge(
        current, updates, ["c_custkey"], ["c_mktsegment"], "2024-06-01 00:00:00"
    )


# --------------------------------------------------------------------------
# Window navigation functions — lag/lead/first_value/ntile in one pass.
# Completes the window family (§2.5): one shuffle on the partition key,
# one sort, all four functions evaluated in a single WindowExec. ntile's
# standard bucket-fill semantics (first n%k buckets take the extra row)
# are identical in Spark and DuckDB; the (date, key) order is total, so
# every navigation value is deterministic.
# --------------------------------------------------------------------------


@query(
    "q_window_nav",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           first_value(o_totalprice) OVER w AS first_price,
           ntile(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    description="window navigation (lag/lead/first_value/ntile) per customer order "
    "history — four functions, one shuffle, one sort, single WindowExec",
    tags=("window",),
)
def q_window_nav(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.ntile(4).over(w).alias("quartile"),
    )


# --------------------------------------------------------------------------
# Correlated scalar subquery — "orders above their customer's average".
# Exercises the Spark SQL surface end to end: Catalyst decorrelates the
# subquery into an aggregate + join (no per-row re-execution — the thing
# naive engines get wrong at scale). The per-customer average uses the
# decimal-exact davg form on both engines so the > comparison is
# bit-deterministic (plans/_util rationale).
# --------------------------------------------------------------------------


@query(
    "q_scalar_subquery",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > (
      SELECT {sql_davg('i.o_totalprice')}
      FROM orders i WHERE i.o_custkey = o.o_custkey)
    """,
    description="correlated scalar subquery (orders above their customer's decimal-exact "
    "average) — Catalyst decorrelates to aggregate + join; SQL-surface entry",
    tags=("sql",),
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import register_temp_views

    register_temp_views(spark, sf_dir, ["orders"])
    return spark.sql(
        f"""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > (
          SELECT {sql_davg('i.o_totalprice')}
          FROM orders i WHERE i.o_custkey = o.o_custkey)
        """
    )


# --------------------------------------------------------------------------
# Grouped Pearson correlation — "which quantities drive price", the
# distributed form of the notebook's influencer analysis (README.md:8,
# coefficient ranking cells 33-36). Built from decimal-exact component
# sums (n, Σx, Σy, Σxy, Σx², Σy²) — one partial+final aggregate — then a
# single identical double expression on both engines: products/divisions
# are exactly-rounded IEEE and sqrt is correctly-rounded by spec, so the
# result is bit-deterministic before the 6dp safety rounding. Never uses
# the engines' built-in corr() (their accumulation orders differ).
# --------------------------------------------------------------------------

_CORR_SQL = (
    "ROUND((n * sxy - sx * sy) / "
    "(SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6)"
)


@query(
    "q_corr",
    oracle=f"""
    WITH g AS (
      SELECT l_returnflag, COUNT(*) AS n,
             {sql_dsum('l_quantity')} AS sx,
             {sql_dsum('l_extendedprice')} AS sy,
             {sql_dsum('l_quantity * l_extendedprice')} AS sxy,
             {sql_dsum('l_quantity * l_quantity')} AS sxx,
             {sql_dsum('l_extendedprice * l_extendedprice')} AS syy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n, {_CORR_SQL} AS corr_qty_price
    FROM g ORDER BY l_returnflag
    """,
    description="grouped Pearson correlation (quantity vs price per returnflag) from "
    "decimal-exact component sums + one deterministic double expression — the "
    "engines' built-in corr() is order-dependent and is deliberately not used",
    tags=("agg",),
)
def q_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(x).alias("sx"),
            dsum(y).alias("sy"),
            dsum(x * y).alias("sxy"),
            dsum(x * x).alias("sxx"),
            dsum(y * y).alias("syy"),
        )
        .select("l_returnflag", "n", F.expr(_CORR_SQL).alias("corr_qty_price"))
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Incremental rollup maintenance (operators/incremental.py): the engine
# computes the rollup as history-state ⊕ new-batch-state (mergeable
# partial aggregates, merged out of order on purpose) and must equal the
# oracle's full recompute BIT-EXACTLY — the invariant that makes
# incremental pipelines trustworthy. The reference re-reads its entire
# CSV history daily (trulia_csv_to_nlp.ipynb cells 6-8); this is the form
# whose daily cost is |new partition| + |groups|, not |history|.
# --------------------------------------------------------------------------


@query(
    "q_incremental_rollup",
    oracle=f"""
    SELECT o_orderpriority, COUNT(o_totalprice) AS n,
           {sql_dsum('o_totalprice')} AS sum_v,
           {sql_davg('o_totalprice')} AS avg_v,
           MIN(o_totalprice) AS min_v, MAX(o_totalprice) AS max_v
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    description="incremental rollup maintenance: history-state ⊕ new-batch-state "
    "(mergeable partial aggregates, deliberately merged out of order) must equal "
    "the full recompute bit-exactly; daily cost |batch|+|groups|, not |history|",
    tags=("agg", "warehouse"),
)
def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import finalize, merge_states, rollup_state

    o = load_table(spark, sf_dir, "orders")
    split = ts_lit(o, "o_orderdate", "1999-01-01 00:00:00")
    history = o.filter(F.col("o_orderdate") < split)
    batch = o.filter(F.col("o_orderdate") >= split)
    # merge newest-first to prove order independence
    merged = merge_states(
        rollup_state(batch, ["o_orderpriority"], "o_totalprice"),
        rollup_state(history, ["o_orderpriority"], "o_totalprice"),
    )
    return finalize(merged).orderBy("o_orderpriority")


# --------------------------------------------------------------------------
# Expectations contract (operators/expect.py) over orders: the whole
# multi-constraint contract compiles into ONE partial+final aggregate over
# one scan — adding a constraint adds a column, not a pass. The
# distributed, counted form of the reference's implicit astype/fail-fast
# and eyeballed df.info() validation.
# --------------------------------------------------------------------------


@query(
    "q_validate",
    oracle="""
    SELECT CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') OR o_orderstatus IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS bad_status,
           CAST(SUM(CASE WHEN o_totalprice < 0 OR o_totalprice IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS neg_price,
           CAST(SUM(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-')
                              OR o_orderpriority IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS bad_priority,
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS dup_o_orderkey
    FROM orders
    """,
    description="data-quality expectations contract (null/domain/range/format/uniqueness) "
    "counted in ONE aggregate over one scan — the gate a scheduler holds a "
    "pipeline on; distributed form of the reference's fail-fast astype",
    tags=("validate",),
)
def q_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import expect as X

    o = load_table(spark, sf_dir, "orders")
    return X.check(
        o,
        {
            "null_custkey": X.not_null("o_custkey"),
            "bad_status": X.in_set("o_orderstatus", ["O", "F", "P"]),
            "neg_price": X.in_range("o_totalprice", lo=0),
            "bad_priority": X.matches("o_orderpriority", "^[1-5]-"),
        },
        unique_on=["o_orderkey"],
    )


# --------------------------------------------------------------------------
# Remaining join/date/conditional/array family completion (§2.3, §2.8).
# --------------------------------------------------------------------------


@query(
    "q_join_outer",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
    FROM customer c FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey
    """,
    description="full outer join customer⟗orders (completes the join family) — "
    "null-extended rows on both sides survive the hash compare; SMJ at scale, "
    "AQE-skew-splittable",
    tags=("join",),
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return c.join(o, c.c_custkey == o.o_custkey, "full_outer").select(
        "c_custkey", "c_mktsegment", "o_orderkey", "o_totalprice"
    )


@query(
    "q_date_parts",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS q,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS m,
           date_trunc('month', o_orderdate) AS month_start,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1, 2, 3, 4 ORDER BY y, m
    """,
    description="date-part extraction + truncation grouping (year/quarter/month + "
    "date_trunc month buckets) — the calendar rollup every daily-batch corpus "
    "reports on; pure codegen, partial+final aggregate",
    tags=("date",),
)
def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("y"),
            F.quarter("o_orderdate").alias("q"),
            F.month("o_orderdate").alias("m"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("y", "m")
    )


@query(
    "q_conditional_agg",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
           {sql_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END")} AS finished_revenue
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    description="conditional aggregation (FILTER-clause form): per-priority status "
    "breakdown + conditional decimal revenue in one aggregate — the sum(when) "
    "pivot shape, no second scan",
    tags=("agg",),
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    is_f = F.col("o_orderstatus") == "F"
    is_o = F.col("o_orderstatus") == "O"
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(is_f, 1).otherwise(0)).cast("long").alias("n_finished"),
            F.sum(F.when(is_o, 1).otherwise(0)).cast("long").alias("n_open"),
            dsum(F.when(is_f, F.col("o_totalprice")).otherwise(F.lit(0.0))).alias(
                "finished_revenue"
            ),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_array_ops",
    oracle="""
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',') AS vocab_csv,
           CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_vocab
    FROM documents
    """,
    description="array-function pipeline (split → distinct → sort → join) per document — "
    "higher-order array ops stay in codegen, zero Python, zero explode/shuffle",
    tags=("array",),
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_join(F.array_sort(F.array_distinct(toks)), ",").alias("vocab_csv"),
        F.size(F.array_distinct(toks)).alias("n_vocab"),
    )


# --------------------------------------------------------------------------
# Deterministic argmax: "the most expensive order per priority". max_by /
# arg_max are tie-nondeterministic in every engine (whichever tied row a
# partition saw first wins) — unusable where reproducibility matters. The
# deterministic form: max over a (value, key) struct, lexicographic
# comparison, key as tiebreak — still one partial+final aggregate, same
# cost, reproducible under any partitioning.
# --------------------------------------------------------------------------


@query(
    "q_argmax",
    oracle="""
    WITH m AS (
      SELECT o_orderpriority,
             max(struct_pack(p := o_totalprice, k := o_orderkey)) AS s
      FROM orders GROUP BY o_orderpriority)
    SELECT o_orderpriority, s.p AS top_price, s.k AS top_orderkey
    FROM m ORDER BY o_orderpriority
    """,
    description="deterministic argmax (most expensive order per priority) via struct-max "
    "with key tiebreak — reproducible under any partitioning, unlike raw "
    "max_by/arg_max on ties; one partial+final aggregate",
    tags=("agg",),
)
def q_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    s = F.max(
        F.struct(F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k"))
    ).alias("s")
    return (
        o.groupBy("o_orderpriority")
        .agg(s)
        .select(
            "o_orderpriority",
            F.col("s.p").alias("top_price"),
            F.col("s.k").alias("top_orderkey"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_moving_avg",
    # Decimal-exact frame sums: a ROWS frame's membership is defined by the
    # total (o_orderdate, o_orderkey) order, so both engines sum the same 7
    # values; the decimal cast makes the accumulation order irrelevant and
    # the single final division runs on identical operands.
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                  OVER w AS DOUBLE)
             / COUNT(*) OVER w AS smooth_price,
           COUNT(*) OVER w AS frame_n
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    """,
    description="centered 7-row moving average per customer order history (the "
    "sliding ROWS frame the window family was missing: cumulative = "
    "q_window_running, time-valued RANGE = q_rolling_range, this is the "
    "row-adjacency smoother): one shuffle on the partition key, one sort, "
    "single WindowExec evaluating sum+count over the same frame; "
    "decimal-exact frame sums, division on identical operands",
    tags=("window",),
)
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, 3)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("smooth_price"),
        F.count(F.lit(1)).over(w).alias("frame_n"),
    )


@query(
    "q_unpivot",
    # Native DataFrame unpivot/melt (reshape family R2's inverse): wide
    # measure columns to long (measure, value) rows — an Expand node, map-only,
    # shuffle-free; the oracle is the portable UNION ALL spelling.
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    """,
    description="unpivot/melt wide→long (inverse of the R2 pivot family): three "
    "measure columns become (measure, val) rows via the native unpivot — one "
    "Expand over one scan, map-only and shuffle-free, vs the UNION ALL "
    "spelling's three scans",
    tags=("reshape",),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    ).withColumn(
        "measure",
        F.when(F.col("measure") == "l_quantity", "quantity")
        .when(F.col("measure") == "l_extendedprice", "price")
        .otherwise("discount"),
    )


@query(
    "q_date_dim",
    # In-plan table GENERATION (no source scan): the calendar dimension
    # every warehouse joins against, built from one sequence explode —
    # map-only after a 1-row seed, every attribute pure date arithmetic.
    oracle="""
    SELECT CAST(d AS TIMESTAMP) AS d,
           year(d) AS yr, quarter(d) AS qtr, month(d) AS mth,
           dayofweek(CAST(d AS TIMESTAMP)) AS dow,
           CAST(strftime(d, '%Y-%m') AS VARCHAR) AS ym,
           CASE WHEN dayofweek(CAST(d AS TIMESTAMP)) IN (0, 6)
                THEN 1 ELSE 0 END AS is_weekend
    FROM generate_series(DATE '1995-01-01', DATE '2001-12-31', INTERVAL 1 DAY) t(d)
    """,
    description="generated calendar dimension 1995-2001 (the date dim every "
    "warehouse broadcast-joins against): one sequence explode from a literal "
    "seed — no source scan — with year/quarter/month/day-of-week/weekend "
    "attributes as pure date arithmetic; DuckDB dayofweek is 0=Sunday, "
    "matched via Spark's dayofweek-1",
    tags=("relational",),
)
def q_date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    seed = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("2001-12-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("dd")
    )
    dow = F.dayofweek("dd") - 1  # Spark: 1=Sunday → DuckDB: 0=Sunday
    return seed.select(
        F.col("dd").cast("timestamp_ntz").alias("d"),
        F.year("dd").cast("long").alias("yr"),
        F.quarter("dd").cast("long").alias("qtr"),
        F.month("dd").cast("long").alias("mth"),
        dow.cast("long").alias("dow"),
        F.date_format("dd", "yyyy-MM").alias("ym"),
        F.when(dow.isin(0, 6), 1).otherwise(0).cast("int").alias("is_weekend"),
    )


@query(
    "q_share_of_total",
    # Unpartitioned window aggregate: each group's share of the grand
    # total WITHOUT a second scan or a self-join — the ratio-to-report
    # window shape. The grand total is a window sum OVER () on the tiny
    # aggregated frame (|groups| rows), never over the fact table.
    oracle=f"""
    WITH g AS (
      SELECT n.n_name, {sql_dsum('o.o_totalprice')} AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name)
    SELECT n_name, revenue,
           ROUND(revenue / SUM(revenue) OVER (), 6) AS share
    FROM g
    """,
    description="ratio-to-report (share of grand total) per nation: grouped decimal "
    "revenue, then a window SUM OVER () on the |groups|-row aggregate — the "
    "grand total costs one single-partition pass over K rows, not a second "
    "fact scan or a self-join; share division on identical operands, rounded "
    "once",
    tags=("window", "relational"),
)
def q_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    g = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    w = Window.partitionBy()
    return g.select(
        "n_name",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(w), 6).alias("share"),
    )


@query(
    "q_active_streaks",
    # Gaps-and-islands: longest run of CONSECUTIVE active days per user.
    # The islands come from the classic (day − dense_rank) grouping key —
    # two window passes over the per-user distinct-day frame (tiny vs the
    # event table), no self-join, no iteration.
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events),
    ranked AS (
      SELECT user_id, d,
             CAST(d AS DATE) - CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY d) AS INTEGER) AS grp
      FROM days),
    runs AS (
      SELECT user_id, COUNT(*) AS run_len, MIN(d) AS run_start
      FROM ranked GROUP BY user_id, grp)
    SELECT user_id, CAST(MAX(run_len) AS BIGINT) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_runs
    FROM runs GROUP BY user_id
    """,
    description="gaps-and-islands longest consecutive-active-day streak per user: "
    "distinct (user, day) frame, the day-minus-row_number island key, one "
    "grouped count per island, max per user — two window/aggregate passes "
    "over the per-user day frame (bounded by days, not events), no self-join, "
    "no iteration; the engagement-streak report every activity warehouse runs",
    tags=("window", "timeseries"),
)
def q_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    ranked = days.withColumn(
        "grp", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    runs = ranked.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("run_len"))
    return runs.groupBy("user_id").agg(
        F.max("run_len").cast("long").alias("longest_streak"),
        F.count(F.lit(1)).cast("long").alias("n_runs"),
    )


@query(
    "q_scd2_pointintime",
    # Point-in-time join against a versioned dimension: each order joins
    # the dim VERSION that was valid at its order date (the temporal-
    # consistency rule that stops a 1997 order reporting under a 1999
    # segment). The versioned dim is synthesized deterministically in-plan
    # (two versions per customer split at 1998-07-01, segment suffixed for
    # the later slice). Physical shape: equi-join on the key with the
    # validity window as a residual — fan-out is versions-per-key (2),
    # NEVER a range-only join.
    oracle="""
    WITH dim AS (
      SELECT c_custkey, c_mktsegment AS segment,
             TIMESTAMP '1900-01-01' AS valid_from,
             TIMESTAMP '1998-07-01' AS valid_to
      FROM customer
      UNION ALL
      SELECT c_custkey, c_mktsegment || '_V2',
             TIMESTAMP '1998-07-01', TIMESTAMP '9999-01-01'
      FROM customer)
    SELECT d.segment, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN dim d ON o.o_custkey = d.c_custkey
              AND o.o_orderdate >= d.valid_from
              AND o.o_orderdate < d.valid_to
    GROUP BY d.segment
    """,
    description="point-in-time join to an SCD2 versioned dimension (the temporal-"
    "consistency join the scd2_merge warehouse surface exists to serve): each "
    "order matches the dim version valid at its order date — equi-join on the "
    "business key with the validity window as a residual predicate, fan-out "
    "bounded by versions-per-key, never a range-only nested loop; versioned "
    "dim synthesized deterministically in-plan",
    tags=("join", "relational"),
)
def q_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    v1 = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1900-01-01").cast("timestamp_ntz").alias("valid_from"),
        F.lit("1998-07-01").cast("timestamp_ntz").alias("valid_to"),
    )
    v2 = c.select(
        "c_custkey",
        F.concat(F.col("c_mktsegment"), F.lit("_V2")).alias("segment"),
        F.lit("1998-07-01").cast("timestamp_ntz").alias("valid_from"),
        F.lit("9999-01-01").cast("timestamp_ntz").alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    joined = o.join(
        F.broadcast(dim),
        (o.o_custkey == dim.c_custkey)
        & (o.o_orderdate >= dim.valid_from)
        & (o.o_orderdate < dim.valid_to),
    )
    return joined.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double").alias("revenue"),
    )


@query(
    "q_mom_growth",
    # Period-over-period growth: lag() runs on the MONTHLY AGGREGATE frame
    # (|nations × months| rows), never the fact table — the BI report shape
    # where the window cost is proportional to the report, not the data.
    oracle=f"""
    WITH m AS (
      SELECT n.n_name, CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) AS mth,
             {sql_dsum('o.o_totalprice')} AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name, mth)
    SELECT n_name, mth, revenue,
           ROUND((revenue - LAG(revenue) OVER w)
                 / LAG(revenue) OVER w, 6) AS mom_growth
    FROM m
    WINDOW w AS (PARTITION BY n_name ORDER BY mth)
    """,
    description="month-over-month revenue growth per nation: decimal monthly "
    "rollup first (partial+final over the fact), then lag()+growth on the "
    "|nations×months| report frame — the window pass costs report-size, not "
    "data-size; first month's growth is NULL by definition",
    tags=("window", "relational"),
)
def q_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    m = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.date_trunc("month", "o_orderdate").alias("mth"))
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy("mth")
    prev = F.lag("revenue").over(w)
    return m.select(
        "n_name",
        "mth",
        "revenue",
        F.round((F.col("revenue") - prev) / prev, 6).alias("mom_growth"),
    )


@query(
    "q_cumulative_users",
    # Cumulative distinct users per day — computed WITHOUT a distinct-over-
    # growing-window (which would re-scan every prefix, O(days²) at best):
    # each user's FIRST-SEEN day (one aggregate), daily first-seen counts,
    # then a running sum over the |days|-row frame. The standard rewrite
    # that turns an unbounded-distinct window into two partial-agg passes.
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS d
      FROM events GROUP BY user_id),
    daily AS (
      SELECT d, COUNT(*) AS new_users FROM first_seen GROUP BY d)
    SELECT CAST(d AS TIMESTAMP) AS d, new_users,
           CAST(SUM(new_users) OVER (ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cume_users
    FROM daily
    """,
    description="cumulative distinct users per day via the first-seen rewrite: "
    "MIN(day) per user (one partial+final aggregate), daily new-user counts, "
    "running sum over the |days|-row frame — replaces the O(days²) distinct-"
    "over-growing-window with two linear aggregates; the DAU/retention "
    "companion every activity warehouse materializes",
    tags=("window", "timeseries"),
)
def q_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts").cast("date")).alias("d")
    )
    daily = first_seen.groupBy("d").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.col("d").cast("timestamp_ntz").alias("d"),
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cume_users"),
    )


@query(
    "q_weekend_activity",
    # The generated calendar dim (q_date_dim) in actual use: a broadcast
    # join from the event stream to its day row, rolled up by the dim's
    # weekend attribute — the generated-dimension join every warehouse
    # report runs.
    oracle="""
    WITH dim AS (
      SELECT CAST(d AS DATE) AS d,
             CASE WHEN dayofweek(CAST(d AS TIMESTAMP)) IN (0, 6)
                  THEN 1 ELSE 0 END AS is_weekend
      FROM generate_series(DATE '2024-01-01', DATE '2024-12-31', INTERVAL 1 DAY) t(d))
    SELECT e.event_type, dim.is_weekend, COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events e
    JOIN dim ON CAST(date_trunc('day', e.ts) AS DATE) = dim.d
    GROUP BY e.event_type, dim.is_weekend
    """,
    description="weekend-vs-weekday activity rollup: the generated calendar "
    "dimension joined (broadcast — 366 rows) onto the event stream by day, "
    "grouped by the dim attribute with decimal-exact value sums; the "
    "generated-dim join shape q_date_dim exists to serve",
    tags=("join", "timeseries"),
)
def q_weekend_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dim = (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("2024-01-01").cast("date"),
                    F.lit("2024-12-31").cast("date"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("d")
        )
        .select(
            "d",
            F.when((F.dayofweek("d") - 1).isin(0, 6), 1).otherwise(0).alias("is_weekend"),
        )
    )
    return (
        ev.join(F.broadcast(dim), F.date_trunc("day", "ts").cast("date") == dim.d)
        .groupBy("event_type", "is_weekend")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )


@query(
    "q_nullsafe_join",
    # Null-safe equality (<=> / IS NOT DISTINCT FROM): NULL keys MATCH each
    # other instead of vanishing — the semantics a changelog/state compare
    # needs (two absent values are the "same"). Regular equality silently
    # drops every NULL-keyed row; the plan is still a hash join (null-safe
    # equality is hashable).
    oracle="""
    WITH e AS (
      SELECT event_id,
             CASE WHEN event_type IN ('view', 'click') THEN event_type END AS k
      FROM events),
    d AS (
      SELECT * FROM (VALUES ('view', 'browse'), ('click', 'interact'),
                            (NULL, 'other')) t(k, category))
    SELECT d.category, COUNT(*) AS n
    FROM e JOIN d ON e.k IS NOT DISTINCT FROM d.k
    GROUP BY d.category
    """,
    description="null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys "
    "match the dim's NULL row instead of being dropped — the state-compare/"
    "changelog semantics where two absences agree; still a broadcast HASH "
    "join (null-safe equality hashes), never a nested loop",
    tags=("join", "relational"),
)
def q_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_type").isin("view", "click"), F.col("event_type")).alias("k"),
    )
    dim = spark.createDataFrame(
        [("view", "browse"), ("click", "interact"), (None, "other")],
        "k string, category string",
    )
    return (
        ev.join(F.broadcast(dim), ev.k.eqNullSafe(dim.k))
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_skyline",
    # 2-D skyline (Pareto frontier: bigger part, cheaper price) via the
    # sort + cumulative-strict-min trick: after ordering by size DESC, a
    # part is dominated iff some EARLIER row (≥ size) was also strictly
    # cheaper — i.e. iff running min(price) over the preceding frame
    # undercuts it. One range shuffle + one window pass, O(n log n) — the
    # classic nested-loop dominance join is O(n²) and never appears.
    # Size ties order by price so an equal-size cheaper part precedes and
    # dominates; equal (size, price) duplicates all survive (none strictly
    # dominates another).
    oracle="""
    WITH s AS (
      SELECT p_partkey, p_size, p_retailprice,
             MIN(p_retailprice) OVER (
               ORDER BY p_size DESC, p_retailprice, p_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_prev
      FROM part)
    SELECT p_partkey, p_size, p_retailprice
    FROM s WHERE best_prev IS NULL OR p_retailprice < best_prev
    """,
    description="2-D skyline / Pareto frontier (largest-and-cheapest parts) via "
    "sort + cumulative strict-min: a row is dominated iff the running minimum "
    "price over the size-descending prefix undercuts it — one ordered window "
    "pass, O(n log n), replacing the O(n²) dominance self-join; deterministic "
    "under ties (equal-size rows ordered cheapest-first)",
    tags=("window", "relational"),
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w = (
        Window.orderBy(F.desc("p_size"), "p_retailprice", "p_partkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s = p.select(
        "p_partkey", "p_size", "p_retailprice",
        F.min("p_retailprice").over(w).alias("best_prev"),
    )
    return s.filter(
        F.col("best_prev").isNull() | (F.col("p_retailprice") < F.col("best_prev"))
    ).select("p_partkey", "p_size", "p_retailprice")


@query(
    "q_transition_matrix",
    # First-order Markov transition counts over each user's event sequence
    # — the behavior model (and sequence-corpus sanity report) built from
    # one lead() over the per-user timeline + one grouped count. Row
    # probabilities divide by the in-plan per-state totals (window sum on
    # the K²-row matrix, not the event table).
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events),
    m AS (
      SELECT cur, nxt, COUNT(*) AS n FROM seq WHERE nxt IS NOT NULL
      GROUP BY cur, nxt)
    SELECT cur, nxt, n,
           ROUND(n / CAST(SUM(n) OVER (PARTITION BY cur) AS DOUBLE), 6) AS p
    FROM m
    """,
    description="first-order Markov transition matrix over per-user event "
    "sequences: lead() on the (ts, event_id)-ordered timeline (one entity-key "
    "shuffle), grouped pair counts, row-normalized by a window sum over the "
    "K²-row matrix — transition probabilities for behavior modeling and "
    "sequence-corpus QA, never a self-join on the stream",
    tags=("window", "timeseries"),
)
def q_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"), F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    m = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("cur")
    return m.select(
        "cur", "nxt", "n",
        F.round(F.col("n") / F.sum("n").over(wt).cast("double"), 6).alias("p"),
    )
