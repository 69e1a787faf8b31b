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


def test_percentile_sketch_tracks_exact(spark):
    """q_percentile_sketch (rows-only ⊘) must land within the sketch's rank
    guarantee of the exact q_percentiles: with accuracy=10000 and group
    sizes ≪ 10000 at sf0.01, the approx answer equals an actual data value
    adjacent to the exact interpolated percentile — assert within 1% of the
    group's value scale."""
    exact = {r.o_orderpriority: r for r in all_queries()["q_percentiles"].fn(spark, SF_CORRECT).collect()}
    approx = {r.o_orderpriority: r for r in all_queries()["q_percentile_sketch"].fn(spark, SF_CORRECT).collect()}
    assert exact.keys() == approx.keys()
    for k in exact:
        assert exact[k].n == approx[k].n
        for col in ("median_price", "p95_price"):
            e, a = getattr(exact[k], col), getattr(approx[k], col)
            assert abs(e - a) / e < 0.01, (k, col, e, a)
