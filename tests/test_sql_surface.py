"""Spark SQL surface (SURVEY.md §7.7: "Spark SQL *is* the parser").

The catalog registers the testdata tables as temp views; any query a
reference user would hand-write in SQL (their load_save_sql.ipynb builds
SELECT strings) runs verbatim through spark.sql and matches the DataFrame
expression of the same plan."""

from __future__ import annotations

from etl_housing_spark.catalog import register_temp_views
from etl_housing_spark.plans import all_queries

from .conftest import SF_SMOKE


def test_sql_matches_dataframe_flagship(spark):
    register_temp_views(spark, SF_SMOKE)
    sql_out = spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    ).collect()
    df_out = (
        all_queries()["q_pricing_summary"]
        .fn(spark, SF_SMOKE)
        .select("l_returnflag", "l_linestatus", "count_order")
        .collect()
    )
    assert [tuple(r) for r in sql_out] == [tuple(r) for r in df_out]


def test_sql_join_and_window(spark):
    register_temp_views(spark, SF_SMOKE)
    out = spark.sql(
        """
        SELECT o_orderpriority, n_orders FROM (
          SELECT o_orderpriority, COUNT(*) AS n_orders,
                 RANK() OVER (ORDER BY COUNT(*) DESC) AS rk
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY o_orderpriority)
        WHERE rk = 1
        """
    )
    assert out.count() >= 1


def test_all_tables_registered(spark):
    register_temp_views(spark, SF_SMOKE)
    names = {t.name for t in spark.catalog.listTables()}
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        assert t in names
