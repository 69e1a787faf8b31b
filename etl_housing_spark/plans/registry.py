"""Query catalog registry.

Every operator from SURVEY.md §2 that is oracle-checkable registers here as a
(query id → Spark callable + DuckDB oracle SQL) pair; ⊘ ops register with
``oracle=None`` (driver records a rows-only check). ``__spark_entry__.py``
exposes this registry to the correctness driver.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, description: str = "", tags: tuple[str, ...] = ()):
    """Decorator: register a query id with its Spark impl and oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query id: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, description, tuple(tags))
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # import for side-effect registration of every plan module
    from . import (  # noqa: F401
        cleaning_queries,
        dedup_queries,
        eval_queries,
        graph_queries,
        ml_queries,
        pipeline_queries,
        relational,
        sampling_queries,
        sketch_queries,
        stats_queries,
        streaming_queries,
        timeseries_queries,
        tpch_queries,
        text_queries,
        validation_queries,
        vector_queries,
    )

    return dict(_REGISTRY)


def get(name: str) -> QuerySpec:
    return all_queries()[name]
