"""JSONL and ORC sinks/sources (SURVEY.md §2.1 source/sink family).

The reference round-trips its corpus through CSV and SQLite only
(trulia_scrape.py:182-188, load_save_sql.ipynb cells 3-10); a training-data
pipeline's interchange format is JSON Lines — every public corpus dump
(Common Crawl derivatives, instruction sets) ships as one JSON object per
line — and its columnar archive tier is ORC/Parquet. Both are first-class
Spark datasources; these wrappers pin the settings that matter at 100 TB:

- **Explicit schema on read, always.** Schema inference on a JSONL archive
  is a full extra pass over every byte before the real scan; on ORC it is a
  footer read, but an explicit schema still guards against drift between
  shards written by different pipeline versions.
- **Partition layout over file count.** Both writers accept partition
  columns (Hive-style directories → partition pruning on read). JSONL files
  compress with a per-file codec; gzip is NOT splittable (one task per
  file), so shard size — controlled upstream by maxRecordsPerFile or the
  training-shard writer (warehouse.write_training_shards) — is the
  parallelism knob, not in-file splitting. ORC is splittable by stripe
  regardless of codec.
- **JSONL is schema-on-write here**: we write typed columns, so the reader's
  explicit schema reproduces exact types (LongType stays long — inference
  would widen bare integers to long but turn mixed columns into strings).

Timestamps: JSON has no timestamp type — columns round-trip as ISO-8601
strings and the explicit read schema restores them; keep NTZ/LTZ flavor
decisions at the catalog boundary (catalog.load_table), not per-file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_jsonl(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    compression: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Distributed JSON-Lines sink: one JSON object per line per record.

    ``compression`` of "gzip"/"zstd" trades scan parallelism (non-splittable
    files) for bytes; leave None when downstream re-reads with Spark and the
    shard layout already bounds file sizes.
    """
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    data_schema: str,
    base_path: str | None = None,
) -> DataFrame:
    """Schema-pinned JSONL scan (no inference pass over the archive).

    Corrupt lines land in no row rather than poisoning the scan: mode
    PERMISSIVE with a pinned schema nulls unparseable fields, the standard
    contract for ingesting third-party corpus dumps. ``base_path`` enables
    partition discovery when reading a subtree of a partitioned layout.
    """
    r = spark.read.schema(data_schema)
    if base_path:
        r = r.option("basePath", base_path)
    return r.json(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink (zlib default codec): the columnar archive tier. Stripe-
    splittable, predicate-pushdown-capable — interchangeable with parquet
    for engines that standardize on ORC (Hive/Trino warehouses)."""
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.orc(path)


def read_orc(spark: SparkSession, path: str, data_schema: str | None = None) -> DataFrame:
    """ORC scan; schema optional (footer-read, cheap) but pinnable."""
    r = spark.read
    if data_schema:
        r = r.schema(data_schema)
    return r.orc(path)
