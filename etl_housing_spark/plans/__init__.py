"""The declared query catalog — SURVEY.md §2's operator inventory as
(query id → Spark impl + DuckDB oracle SQL) pairs. ``registry.all_queries()``
returns every registered spec; ``__spark_entry__.py`` adapts it to the
driver contract."""

from .registry import all_queries, get, query  # noqa: F401
