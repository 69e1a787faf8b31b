"""Connectors: partitioned CSV, JSON/API payloads, reader registry, warehouse.

Re-expresses the reference's source/sink surface (SURVEY.md §2.1):
- S3/S4 per-city/per-date CSV tree → Spark partitioned CSV with partition
  discovery and pruning,
- S9/S14 config-driven API/CSV dispatch (advanced.ipynb, data_config.json)
  → a reader registry keyed by source name,
- S6-S8 SQLite table ⇄ DataFrame → a parquet-backed warehouse (scale path)
  with an optional JDBC adapter gated behind driver availability.
"""
