"""etl_housing_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
the reference pipeline (datapointchris/etl-housing: pandas scrape→clean→CSV→
SQLite→feature-engineering→Ridge model) as idiomatic Spark DataFrame / SQL /
Structured Streaming, designed for 100 TB-scale clusters:

- every transform is a lazy DataFrame expression (Catalyst optimizes:
  pushdown, pruning, whole-stage codegen);
- built-in ``pyspark.sql.functions`` first — no row-at-a-time Python UDFs in
  any hot path;
- joins declare broadcast/merge strategies; aggregations rely on
  partial+final HashAggregate; AQE handles skew/coalescing at scale.

Layout:
- ``session``    — tuned SparkSession factory
- ``catalog``    — testdata table loaders (incl. nanosecond-parquet shim)
- ``functions``  — column-level expression libraries (cleaning/text/vectors)
- ``operators``  — composite DataFrame→DataFrame operators (dedup, similarity,
                   upsert, encoding, multimodal plumbing)
- ``sources``    — connectors: partitioned CSV, JSON/API, registry, warehouse
- ``plans``      — the declared query catalog (query id → Spark fn + DuckDB
                   oracle SQL), the correctness surface of SURVEY.md §2
- ``streaming``  — Structured Streaming jobs (availableNow ingest, windowed
                   aggs, watermark dedup)
- ``ml``         — pyspark.ml price-model pipeline (reference's Ridge flow)
- ``pipeline``   — config-driven ETL job composer (source→transforms→sink)
"""

__version__ = "0.1.0"
