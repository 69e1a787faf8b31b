"""Partitioned CSV sink/source (SURVEY.md §2.1 S3/S4).

The reference writes ``daily_scrape/{city}/{YYYY-MM-DD}.csv`` by hand
(trulia_scrape.py:182-188) and re-reads it with a glob + per-file
``pd.read_csv`` + concat loop (trulia_csv_to_nlp.ipynb cells 6-8). Here the
same layout is one declarative write with ``partitionBy`` — Hive-style
``city=.../date=...`` directories — and one partition-discovering scan that
gives partition *pruning* for free: a filter on the partition column never
touches non-matching directories, which at 100 TB is the difference between
scanning one day and scanning the archive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_csv(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """One file tree per partition-column tuple, header included.

    Unlike the reference's ``df.to_csv`` per city (a driver-side loop), this
    is a distributed write: each task writes its own partition directories.
    """
    df.write.option("header", True).partitionBy(*partition_cols).mode(mode).csv(path)


def read_partitioned_csv(
    spark: SparkSession,
    path: str,
    data_schema: str,
) -> DataFrame:
    """Partition-discovering scan; ``data_schema`` covers file columns only.

    Partition columns come back from the directory names (schema-on-path,
    exactly what the reference encodes by hand). Keeping the data schema
    explicit avoids a whole-tree inference pass — on a large archive,
    inference alone would read every file once before the real scan.
    """
    return (
        spark.read.option("header", True)
        .schema(data_schema)
        .option("basePath", path)
        .csv(path)
    )
