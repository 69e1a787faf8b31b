"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``etl_housing_spark.plans`` — the engine's query catalog.
``entry`` runs the flagship pricing summary on sf0.001; ``queries`` /
``oracle_sql`` expose every declared query id from SURVEY.md §2 with its
DuckDB oracle (rows-only ops return no oracle entry).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_housing_spark.plans import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return all_queries()["q_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per checkable query id."""
    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }
