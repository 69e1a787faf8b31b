"""Spark 4 native Python DataSource for the snapshot store (SURVEY §2.1
S1/S2 — the engine-side face of the reference's scraper).

``spark.read.format("housing_snapshots").load(dir)`` reads a directory of
page-snapshot files through the Python DataSource API
(pyspark.sql.datasource, Spark 4.x) — the idiomatic Spark-4 packaging of
what sources/html_extract.py exposes as a mapInPandas stage. One
``InputPartition`` per snapshot file, so Spark schedules files across
executors exactly like any file source; rows are produced inside the
reader (Arrow-batched by the runtime), never collected on the driver.

Two modes (``option("mode", ...)``):

- ``snapshots`` (default): one row per file — ``(url, html, fetch_date)``,
  the snapshot-table contract consumed by ``extract_listings``.
- ``listings``: the extraction itself is PUSHED INTO the source — each
  partition parses its page with the stdlib mini-DOM (html_extract's
  ``_page_rows``, the trulia_scrape.py:115-148 semantics) and emits raw
  14-column listing rows directly; a malformed page contributes zero rows
  instead of failing the task (trulia_scrape.py:204-211 per-URL
  isolation). Equivalence with the mapInPandas path is pinned by
  tests/test_datasource.py.

Snapshot file convention (written by :func:`write_snapshot_dir`):
``{fetch_date}__{percent-encoded-url}.html`` — metadata rides in the name
so a snapshot dir needs no sidecar manifest.

The live crawl remains OUTSIDE the engine (SURVEY §3 boundary): this reads
stored snapshots, it does not fetch.
"""

from __future__ import annotations

import os
import urllib.parse
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from .html_extract import LISTING_COLUMNS

SNAPSHOT_DDL = "url string, html string, fetch_date string"
LISTING_DDL = ", ".join(f"{c} string" for c in LISTING_COLUMNS)


def snapshot_filename(url: str, fetch_date: str) -> str:
    return f"{fetch_date}__{urllib.parse.quote(url, safe='')}.html"


def parse_snapshot_filename(name: str) -> tuple[str, str]:
    """filename → (url, fetch_date); raises ValueError on non-conforming."""
    stem, ext = os.path.splitext(name)
    if ext != ".html" or "__" not in stem:
        raise ValueError(f"not a snapshot filename: {name!r}")
    fetch_date, enc = stem.split("__", 1)
    return urllib.parse.unquote(enc), fetch_date


def write_snapshot_dir(rows: Sequence[tuple[str, str, str]], path: str) -> None:
    """(url, html, fetch_date) rows → one file each under ``path`` (test
    fixture / ingest helper; the crawler writes the same convention)."""
    os.makedirs(path, exist_ok=True)
    for url, html, fetch_date in rows:
        with open(os.path.join(path, snapshot_filename(url, fetch_date)), "w") as fh:
            fh.write(html)


class _SnapshotPartition(InputPartition):
    def __init__(self, file_path: str):
        self.file_path = file_path


class _SnapshotReader(DataSourceReader):
    def __init__(self, path: str, mode: str):
        if not path:
            raise ValueError("housing_snapshots requires a path (load(dir))")
        self.path = path
        self.mode = mode

    def partitions(self) -> Sequence[InputPartition]:
        files = sorted(
            f for f in os.listdir(self.path) if f.endswith(".html") and "__" in f
        )
        # one partition per file: Spark schedules pages across executors
        # like any file source; a page is the natural parse unit
        return [_SnapshotPartition(os.path.join(self.path, f)) for f in files]

    def read(self, partition: _SnapshotPartition) -> Iterator[tuple]:
        url, fetch_date = parse_snapshot_filename(os.path.basename(partition.file_path))
        with open(partition.file_path) as fh:
            html = fh.read()
        if self.mode == "snapshots":
            yield (url, html, fetch_date)
            return
        from .html_extract import _page_rows

        try:
            rows = _page_rows(url, html, fetch_date)
        except Exception:
            return  # per-page isolation: a malformed page loses itself only
        for r in rows:
            yield tuple(r)


class _SnapshotStreamReader(SimpleDataSourceStreamReader):
    """Incremental snapshot ingest — the engine-side of the reference's
    cron-driven scrape loop (crontest.py / trulia_scrape.py main()): the
    crawler keeps dropping snapshot files, each microbatch picks up the
    files that arrived since the last offset.

    Offset = the last consumed filename. Filenames lead with fetch_date,
    so lexicographic filename order is temporal order and the offset is a
    single monotone watermark (no growing processed-set in the offset
    log). Contract: the crawler writes monotonically non-decreasing
    fetch_dates (a backfilled EARLIER date would sort behind the watermark
    and be skipped — run backfills through the batch reader instead).
    ``readBetweenOffsets`` replays any (start, end] window exactly, so
    recovery after a crash re-reads the same files."""

    def __init__(self, path: str, mode: str):
        if not path:
            raise ValueError("housing_snapshots stream requires a path")
        self.path = path
        self.mode = mode

    def _files(self) -> list[str]:
        return sorted(
            f for f in os.listdir(self.path) if f.endswith(".html") and "__" in f
        )

    def initialOffset(self) -> dict:
        return {"last": ""}

    def _rows_for(self, names: list[str]) -> Iterator[tuple]:
        for name in names:
            with open(os.path.join(self.path, name)) as fh:
                html = fh.read()
            url, fetch_date = parse_snapshot_filename(name)
            if self.mode == "snapshots":
                yield (url, html, fetch_date)
                continue
            from .html_extract import _page_rows

            try:
                rows = _page_rows(url, html, fetch_date)
            except Exception:
                continue  # per-page isolation, same as the batch reader
            for r in rows:
                yield tuple(r)

    def read(self, start: dict) -> tuple[list[tuple], dict]:
        names = [f for f in self._files() if f > start.get("last", "")]
        end = {"last": names[-1]} if names else dict(start)
        # materialized list, not a generator: the simple-reader runtime
        # prefetches on the driver and copy.copy()s the batch for replay —
        # a generator is unpicklable there. Batches are page-sized by
        # construction (files since last trigger), so this is the API's
        # intended driver-side prefetch, not a scalability cliff.
        return list(self._rows_for(names)), end

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        lo, hi = start.get("last", ""), end.get("last", "")
        return list(self._rows_for([f for f in self._files() if lo < f <= hi]))


class HousingSnapshotDataSource(DataSource):
    """``spark.dataSource.register(HousingSnapshotDataSource)`` then
    ``spark.read.format("housing_snapshots").load(dir)`` (batch) or
    ``spark.readStream.format("housing_snapshots").load(dir)``
    (incremental microbatches over newly arriving snapshot files)."""

    @classmethod
    def name(cls) -> str:
        return "housing_snapshots"

    def schema(self) -> StructType | str:
        if self.options.get("mode", "snapshots") == "listings":
            return LISTING_DDL
        return SNAPSHOT_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SnapshotReader(
            self.options.get("path", ""), self.options.get("mode", "snapshots")
        )

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _SnapshotStreamReader(
            self.options.get("path", ""), self.options.get("mode", "snapshots")
        )
