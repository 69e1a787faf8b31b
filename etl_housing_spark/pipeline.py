"""Config-driven ETL job composer (SURVEY.md §2.1 S14).

Re-expresses the reference's Engine → Transformation → Extract class chain
(advanced.ipynb cells 3-7: a config file names sources; ``Transformation``
dispatches to a per-(source,dataset) method via ``getattr``; ``Engine``
loops the whole registry) without the reflection: a job is (source name,
ordered transforms, sink), all plain data — the dispatch table is explicit,
and each transform is a ``DataFrame → DataFrame`` callable so the composed
job stays one lazy Catalyst plan from scan to sink.

The reference's eager per-record loops (``for record in
self.data['records']``, advanced.ipynb cell 5) become whole-plan
expressions; the Mongo sink (cell 12 ``insert_many(df.to_dict('records'))``)
becomes any registered sink callable — parquet warehouse tables here,
``write.format('mongodb')`` where a connector is deployed.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .sources.registry import SourceRegistry

Transform = Callable[[DataFrame], DataFrame]
Sink = Callable[[DataFrame], None]


@dataclass
class ETLJob:
    """One declared pipeline: source → transforms → sink."""

    source: str
    transforms: list[Transform] = field(default_factory=list)
    sink: Sink | None = None

    def dataframe(self, spark: SparkSession, registry: SourceRegistry) -> DataFrame:
        df = registry.read(spark, self.source)
        for t in self.transforms:
            df = t(df)
        return df

    def run(self, spark: SparkSession, registry: SourceRegistry) -> DataFrame:
        df = self.dataframe(spark, registry)
        if self.sink is not None:
            self.sink(df)
        return df


class Engine:
    """The reference's Engine loop (advanced.ipynb cell 7): run every
    registered job. Jobs are independent plans; failures are collected, not
    cascaded (the reference's per-URL try/except-continue discipline,
    trulia_scrape.py:204-211, applied at job granularity)."""

    def __init__(self, registry: SourceRegistry) -> None:
        self.registry = registry
        self.jobs: dict[str, ETLJob] = {}

    def register(self, name: str, job: ETLJob) -> None:
        self.jobs[name] = job

    def run_all(self, spark: SparkSession) -> dict[str, DataFrame | Exception]:
        results: dict[str, DataFrame | Exception] = {}
        for name, job in self.jobs.items():
            try:
                results[name] = job.run(spark, self.registry)
            except Exception as e:  # noqa: BLE001 — collected and reported
                results[name] = e
        return results
