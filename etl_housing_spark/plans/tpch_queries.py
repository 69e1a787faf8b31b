"""Classic TPC-H decision-support shapes (Q3/Q4/Q5/Q10/Q17/Q18 analogs).

The reference's relational surface is single-table pandas (SURVEY.md §2.6-2.8,
trulia_csv_to_nlp.ipynb cells 6-36); the warehouse it feeds would run exactly
these multi-way join/aggregate reports. Each query here exercises a join
topology the engine must plan well at 100 TB, and each documents what Catalyst
must do with it:

- Q3  (q_shipping_priority): dim-filter → broadcast → big-big join whose join
  key IS the grouping key, so the aggregate reuses the join's partitioning —
  zero extra shuffles after the fact-fact join.
- Q4  (q_order_priority): EXISTS → left-semi join with a residual inequality
  on both sides' columns (hash equi-join + post-filter, never a nested loop).
- Q5  (q_local_volume): 6-table snowflake with a cross-dimension equality
  (customer.nation = supplier.nation) folded into a broadcast join condition.
- Q10 (q_returned_items): date+flag filtered fact-fact join, customer rollup,
  top-k by revenue via TakeOrderedAndProject.
- Q17 (q_small_qty_revenue): per-key aggregate joined back to the same scan
  (the decorrelated form of a correlated scalar subquery), brand-pruned
  before the heavy aggregate so the avg is computed only for surviving keys.
- Q18 (q_big_order_customers): HAVING on a grouped decimal sum, then the
  surviving keys (tiny) drive broadcast joins against orders/customer.

All money math follows the catalog contract (plans/_util.py): revenue
``price·(1−discount)`` is one double multiply on identical operands in both
engines, then accumulates in DECIMAL(18,6) so partial+final aggregation order
cannot move the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ._util import dsum, sql_dsum
from .registry import query

_REV = "l_extendedprice * (1 - l_discount)"


def _rev_col():
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")


def _sql_rev() -> str:
    return sql_dsum(_REV)


@query(
    "q_shipping_priority",
    # TPC-H Q3. Revenue per undelivered order for one market segment: the
    # orderdate/shipdate cutoffs straddle 1998-07-01 so both fact scans are
    # date-pruned at the parquet footer.
    oracle=f"""
    SELECT l.l_orderkey,
           {_sql_rev()} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-07-01'
      AND l.l_shipdate > TIMESTAMP '1998-07-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    description="shipping-priority report (TPC-H Q3): segment-filtered customer dim "
    "broadcast into date-pruned orders, one big-big join to the shipdate-pruned "
    "fact, then a group on the JOIN KEY — the aggregate reuses the join's hash "
    "partitioning, so the plan pays exactly one fact-fact shuffle; top-10 via "
    "TakeOrderedAndProject, no global sort",
    tags=("join", "tpch"),
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < "1998-07-01")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > "1998-07-01")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_rev_col()).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q_order_priority",
    # TPC-H Q4. The EXISTS probe carries an inequality over BOTH tables'
    # columns (shipped >90 days after ordering); Spark plans the equi part as
    # a left-semi hash join and evaluates the residual inside the join — the
    # decorrelated form every engine wants, never a per-row subquery.
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o.o_orderpriority
    """,
    description="order-priority checking (TPC-H Q4): EXISTS as a LEFT-SEMI hash join "
    "on the order key with the 90-day lateness inequality as a residual join "
    "predicate — one shuffle pair, no correlated per-row probe; date window "
    "pushed to the orders scan",
    tags=("join", "tpch"),
)
def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "q_local_volume",
    # TPC-H Q5. The snowflake's one genuinely large join is lineitem⋈orders;
    # customer/supplier/nation/region all broadcast. The Q5 twist —
    # customer and supplier must sit in the SAME nation — becomes an extra
    # equality inside the supplier broadcast-join condition, not a filter
    # after a wider join.
    oracle=f"""
    SELECT n.n_name, {_sql_rev()} AS revenue, COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
    description="local-supplier volume (TPC-H Q5): 6-table snowflake — one "
    "fact-fact shuffle (lineitem⋈date-pruned orders), every dimension "
    "broadcast, and the customer-nation = supplier-nation locality constraint "
    "folded into the supplier join condition so no oversized intermediate "
    "ever materializes",
    tags=("join", "tpch"),
)
def q_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1999-01-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
    r = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_rev_col()).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "q_returned_items",
    # TPC-H Q10: who returned the most revenue last quarter-and-a-half.
    oracle=f"""
    SELECT c.c_custkey, c.c_name, {_sql_rev()} AS revenue, c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    description="returned-item reporting (TPC-H Q10): returnflag-pruned fact ⋈ "
    "date-pruned orders (the one big shuffle), customer+nation broadcast onto "
    "the result, rollup per customer, top-20 by lost revenue via "
    "TakeOrderedAndProject",
    tags=("join", "tpch"),
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_rev_col()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q_small_qty_revenue",
    # TPC-H Q17. The correlated scalar subquery (per-part average quantity)
    # decorrelates to a grouped aggregate joined back to the same brand-pruned
    # row set. Both engines compute the identical decimal-exact average, the
    # identical 0.2·avg double product, and the identical strict compare, so
    # the surviving row set — and its decimal revenue sum — match bit-for-bit.
    oracle=f"""
    SELECT CAST({sql_dsum("l.l_extendedprice")} / 7.0 AS DOUBLE) AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#12'
      AND l.l_quantity < (
        SELECT 0.2 * ({sql_dsum("li.l_quantity")} / COUNT(li.l_quantity))
        FROM lineitem li WHERE li.l_partkey = l.l_partkey)
    """,
    description="small-quantity-order revenue (TPC-H Q17): correlated avg-quantity "
    "subquery decorrelated into a per-part aggregate joined back to the brand-"
    "pruned fact rows — the brand broadcast prunes BEFORE the heavy aggregate, "
    "so the average is computed only for the ~1% of parts that matter; one "
    "shuffle on partkey reused by both the aggregate and the join",
    tags=("join", "tpch"),
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#12")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    # brand-pruned fact rows: every lineitem of a Brand#12 part — the same
    # row set the correlated subquery aggregates over, so the per-part avg
    # computed here equals the oracle's per-part avg over all lineitems.
    li_b = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_q = li_b.groupBy("l_partkey").agg(
        (dsum("l_quantity") / F.count("l_quantity")).alias("avg_qty")
    )
    joined = li_b.join(
        F.broadcast(avg_q.withColumnRenamed("l_partkey", "a_partkey")),
        F.col("l_partkey") == F.col("a_partkey"),
    )
    return joined.filter(F.col("l_quantity") < 0.2 * F.col("avg_qty")).agg(
        (dsum("l_extendedprice") / 7.0).cast("double").alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q_big_order_customers",
    # TPC-H Q18. The HAVING survivor set (orders with >250 total quantity,
    # ~1% of orders) is tiny; it drives the rest of the plan as a broadcast.
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, {sql_dsum("l_quantity")} AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING {sql_dsum("l_quantity")} > 250)
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, b.sum_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 10
    """,
    description="large-volume customers (TPC-H Q18): grouped decimal quantity sum "
    "with HAVING > 250 (one fact shuffle) shrinks to ~1% of orders; the "
    "survivor set broadcasts into orders and customer — the filter-early "
    "topology where the expensive aggregate runs FIRST and every join after "
    "it is map-side; top-10 via TakeOrderedAndProject",
    tags=("join", "tpch"),
)
def q_big_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


@query(
    "q_forecast_revenue",
    # TPC-H Q6: the canonical predicate-pushdown measurement — every filter
    # (date range, discount band, quantity cap) reaches the parquet scan as
    # PushedFilters, the aggregate is a single partial+final over the
    # surviving ~0.2% of rows, and nothing else happens. The revenue
    # product accumulates in decimal, matching the catalog contract.
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    description="forecast revenue change (TPC-H Q6): the pure scan+filter+aggregate "
    "probe — date window, discount band and quantity cap ALL pushed to the "
    "parquet reader (plan-asserted), one partial+final decimal aggregate over "
    "the ~0.2% survivors; at 100 TB this query is bounded by how much the scan "
    "can skip, which is exactly what the pushdown + min/max layout provide",
    tags=("tpch",),
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_cust_order_distribution",
    # TPC-H Q13: the distribution query — how many customers placed k
    # orders, INCLUDING k = 0 (the rows only an outer join can produce).
    oracle="""
    SELECT c_count, COUNT(*) AS n_cust FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey) t
    GROUP BY c_count
    """,
    description="customer order-count distribution (TPC-H Q13): LEFT OUTER join so "
    "zero-order customers survive with COUNT(o_orderkey)=0 — the k=0 bucket a "
    "plain inner join silently loses; the per-customer count groups on the "
    "JOIN KEY (exchange reused), and the final distribution aggregate runs "
    "over |customers| rows, tiny at any corpus size",
    tags=("join", "tpch"),
)
def q_cust_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("n_cust"))


@query(
    "q_waiting_suppliers",
    # TPC-H Q21 shape: for finished orders with MULTIPLE suppliers, find the
    # supplier who shipped LAST (everyone else was waiting on them). EXISTS
    # and NOT EXISTS both become hash joins — left-semi for "another
    # supplier exists", left-anti for "nobody shipped after me".
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
    """,
    description="suppliers who kept orders waiting (TPC-H Q21): EXISTS → LEFT-SEMI "
    "(another supplier on the order) and NOT EXISTS → LEFT-ANTI (no later "
    "shipment by anyone else), both hash joins on the order key with the "
    "supplier/date inequalities as residual predicates — the classic "
    "multi-correlated-subquery query with zero nested loops; status filter "
    "pushed to the orders scan, supplier dim broadcast",
    tags=("join", "tpch"),
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.select(
        F.col("l_orderkey").alias("k1"),
        F.col("l_suppkey").alias("s1"),
        F.col("l_shipdate").alias("d1"),
    )
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    base = l1.join(o, l1.k1 == o.o_orderkey).drop("o_orderkey")
    multi = base.join(
        l2, (F.col("k1") == l2.k2) & (l2.s2 != F.col("s1")), "left_semi"
    )
    last = multi.join(
        l3,
        (F.col("k1") == l3.k3) & (l3.s3 != F.col("s1")) & (l3.d3 > F.col("d1")),
        "left_anti",
    )
    return (
        last.join(F.broadcast(s), F.col("s1") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q_idle_rich_customers",
    # TPC-H Q22 shape: above-average balance, no recent orders. The global
    # average is a scalar subquery (1-row aggregate cross-joined — the
    # q_scalar_subquery decorrelation); "no recent orders" is a LEFT-ANTI
    # against the date-pruned orders scan.
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(c_acctbal) AS a
      FROM customer WHERE c_acctbal > 0)
    SELECT substr(c.c_name, 10, 1) AS cgroup, COUNT(*) AS n_cust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY cgroup
    """,
    description="idle high-balance customers (TPC-H Q22): global average balance as "
    "an in-plan scalar subquery (1-row aggregate broadcast-cross-joined, no "
    "driver round-trip), dormancy as a LEFT-ANTI join against the date-pruned "
    "orders scan, grouped decimal balance totals per name-digit cohort — the "
    "positive-balance average and the anti probe each cost one scan",
    tags=("join", "tpch"),
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (dsum("c_acctbal") / F.count("c_acctbal")).alias("a")
        )
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("a"))
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return (
        idle.groupBy(F.substring("c_name", 10, 1).alias("cgroup"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dsum("c_acctbal").alias("total_bal"),
        )
    )


@query(
    "q_nation_trade_volume",
    # TPC-H Q7 shape: the SAME dimension joined twice under different roles
    # (supplier's nation vs customer's nation) — two broadcast joins of two
    # aliases of one table, with the cross-role inequality applied after
    # both roles resolve. Year extraction groups the fact by calendar.
    oracle=f"""
    SELECT supp_nation, cust_nation, yr,
           {_sql_rev()} AS revenue, COUNT(*) AS n_items
    FROM (
      SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
             year(l.l_shipdate) AS yr,
             l.l_extendedprice, l.l_discount
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns ON s.s_nationkey = ns.n_nationkey
      JOIN nation nc ON c.c_nationkey = nc.n_nationkey
      JOIN region rs ON ns.n_regionkey = rs.r_regionkey
      JOIN region rc ON nc.n_regionkey = rc.r_regionkey
      WHERE rs.r_name = 'EUROPE' AND rc.r_name = 'EUROPE'
        AND ns.n_name <> nc.n_name) t
    GROUP BY supp_nation, cust_nation, yr
    """,
    description="bi-national trade volume (TPC-H Q7): nation dim joined TWICE under "
    "different roles (supplier's vs customer's nation — two broadcast aliases "
    "of one table), region-restricted on both roles, cross-role inequality "
    "applied once both resolve, yearly decimal revenue rollup; the fact-fact "
    "join is still the only shuffle",
    tags=("join", "tpch"),
)
def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    eur = (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select("n_nationkey", "n_name")
    )
    ns = eur.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation"))
    nc = eur.select(F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("yr"))
        .agg(dsum(_rev_col()).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@query(
    "q_market_share",
    # TPC-H Q8 shape: one nation's share of a region's PROMO-part revenue
    # per year — the share is a conditional decimal sum over the SAME
    # aggregate as the total (one pass), the denominator never a second
    # query. Rounded 6dp once, on identical operands.
    oracle=f"""
    SELECT yr,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_12' THEN rev
                               ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                 / CAST(SUM(rev) AS DOUBLE), 6) AS mkt_share,
           COUNT(*) AS n_items
    FROM (
      SELECT year(o.o_orderdate) AS yr, ns.n_name AS supp_nation,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)) AS rev
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation nc ON c.c_nationkey = nc.n_nationkey
      JOIN region r ON nc.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns ON s.s_nationkey = ns.n_nationkey
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE r.r_name = 'ASIA' AND p.p_type LIKE 'PROMO%') t
    GROUP BY yr
    """,
    description="national market share (TPC-H Q8): NATION_12's slice of ASIA's "
    "PROMO-part revenue per year — numerator as a conditional decimal sum "
    "INSIDE the same single aggregate as the denominator (no second pass, no "
    "self-join); 8-table snowflake with nation again in two roles, every "
    "dimension broadcast, one fact-fact shuffle",
    tags=("join", "tpch"),
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_partkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type").like("PROMO%"))
        .select("p_partkey")
    )
    asia_cust_nations = (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select(F.col("n_nationkey").alias("nc_key"))
    )
    ns = n.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation"))
    rev = _rev_col()
    num = F.when(F.col("supp_nation") == "NATION_12", rev).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(asia_cust_nations), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.round(
                F.sum(num).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
