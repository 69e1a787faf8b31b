"""approx_count_distinct error bound: the rows-only q_approx_distinct must
land within ~3×rsd of the exact cardinalities (HLL guarantee)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_housing_spark.catalog import load_table
from etl_housing_spark.plans import all_queries

from .conftest import SF_CORRECT


def test_approx_distinct_within_bound(spark):
    approx = all_queries()["q_approx_distinct"].fn(spark, SF_CORRECT).first()
    li = load_table(spark, SF_CORRECT, "lineitem")
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("o"), F.countDistinct("l_partkey").alias("p")
    ).first()
    assert abs(approx.approx_orders - exact.o) / exact.o < 0.06
    assert abs(approx.approx_parts - exact.p) / exact.p < 0.06
