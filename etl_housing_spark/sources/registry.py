"""Config-driven reader registry (SURVEY.md §2.1 S9/S10/S14).

The reference's ``advanced.ipynb`` Extract/Transformation classes dispatch on
``dataSource + dataSet`` names read from ``data_config.json`` via
``getattr`` reflection (advanced.ipynb:42-99, cells 3,5). Here the same
capability is a plain dict of named source factories — no reflection, and
each factory returns a *lazy* DataFrame so Catalyst sees the full plan.

API payloads (S9: ``requests.get(url).json()``) enter through
``json_records``: driver-side fetch is the ingest boundary (out of engine
scope per SURVEY §7.7), and the records land in a DataFrame via
``spark.createDataFrame`` with an explicit schema.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

ReaderFactory = Callable[[SparkSession], DataFrame]


@dataclass
class SourceSpec:
    kind: str  # 'csv' | 'json' | 'parquet' | 'records'
    location: str | None = None
    schema: str | None = None
    options: dict | None = None


class SourceRegistry:
    """name → SourceSpec; ``read(spark, name)`` builds the DataFrame."""

    def __init__(self) -> None:
        self._sources: dict[str, SourceSpec] = {}
        self._records: dict[str, tuple[list[dict], str]] = {}

    @classmethod
    def from_config(cls, config_path: str) -> "SourceRegistry":
        """Load a data_config.json-shaped registry: {name: {kind, location, ...}}."""
        reg = cls()
        with open(config_path) as f:
            cfg = json.load(f)
        for name, spec in cfg.items():
            reg.register(name, SourceSpec(**spec))
        return reg

    def register(self, name: str, spec: SourceSpec) -> None:
        self._sources[name] = spec

    def register_records(self, name: str, records: list[dict], schema: str) -> None:
        """In-memory JSON records (API payload shape, advanced.ipynb cell 5)."""
        self._records[name] = (records, schema)
        self._sources[name] = SourceSpec(kind="records")

    def names(self) -> list[str]:
        return sorted(self._sources)

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        spec = self._sources[name]
        opts = spec.options or {}
        if spec.kind == "records":
            records, schema = self._records[name]
            return spark.createDataFrame(records, schema=schema)
        reader = spark.read.options(**opts)
        if spec.schema:
            reader = reader.schema(spec.schema)
        if spec.kind == "csv":
            return reader.option("header", True).csv(spec.location)
        if spec.kind == "json":
            return reader.json(spec.location)
        if spec.kind == "parquet":
            return reader.parquet(spec.location)
        raise ValueError(f"unknown source kind: {spec.kind}")
