"""Testdata catalog: schema-stable loaders for the benchmark tables.

Mirrors the reference's implicit "load the table" steps (CSV glob at
trulia_csv_to_nlp.ipynb cells 6-8, SQLite SELECT at load_save_sql.ipynb
cells 5-6) as parquet scans with explicit post-read normalization.

The one normalization needed: ``events.ts`` is written as parquet
TIMESTAMP(NANOS), which Spark reads only as int64 nanoseconds under
``spark.sql.legacy.parquet.nanosAsLong``; we convert to ``timestamp_ntz``
with truncating division so values match what DuckDB/pyarrow see
(both truncate ns → µs).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import ensure_runtime_confs

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# Handle cache: spark.read.parquet eagerly lists files and reads the footer
# schema (driver RPCs + filesystem round-trips), and a catalog session builds
# hundreds of plans over the same handful of immutable table snapshots — the
# repeated footer reads are pure per-query fixed floor. DataFrames are
# immutable, so the resolved handle is safe to share; keyed by applicationId
# so a new session (or a restarted one) never sees a stale context. The
# testdata/warehouse-layout dirs are written-once-then-read, which is what
# makes snapshot caching sound; anything that rewrites files mid-session
# (streaming ingest, format round-trips) uses its own readers, not this.
_DF_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing types for engine use."""
    ensure_runtime_confs(spark)
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    cached = _DF_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # int64 ns → µs with truncation (matches DuckDB's ns→µs), then
            # naive timestamp; session TZ is UTC so ntz == the stored wall time
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
            )
        elif ts_type == "timestamp":
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    _DF_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_temp_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Expose the catalog to spark.sql(...) under the canonical table names."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)


def ts_lit(df: DataFrame, colname: str, value: str):
    """A timestamp literal cast to the *column's* timestamp flavor.

    Parquet written by pandas reads as ``timestamp_ntz`` under Spark 4's
    NTZ inference but as ``timestamp`` (LTZ) if a host session disables it;
    matching the column dtype keeps comparisons valid either way.
    """
    dtype = dict(df.dtypes)[colname]
    if not dtype.startswith("timestamp"):
        dtype = "timestamp"
    return F.lit(value).cast(dtype)
