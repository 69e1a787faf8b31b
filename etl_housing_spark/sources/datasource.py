"""Spark 4 native Python DataSource for the snapshot store (SURVEY §2.1
S1/S2 — the engine-side face of the reference's scraper).

``spark.read.format("housing_snapshots").load(dir)`` reads a directory of
page-snapshot files through the Python DataSource API
(pyspark.sql.datasource, Spark 4.x) — the idiomatic Spark-4 packaging of
what sources/html_extract.py exposes as a mapInPandas stage. One
``InputPartition`` per snapshot file, so Spark schedules files across
executors exactly like any file source; rows are produced inside the
reader (Arrow-batched by the runtime), never collected on the driver.

Two modes (``option("mode", ...)``; anything else raises at plan time):

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
so a snapshot dir needs no sidecar manifest. Writes are atomic
(tmp-suffix + rename), so a concurrent streaming reader never observes a
partial file; names are length-validated up front so an over-long URL
fails the whole write call before any file lands.

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

from .html_extract import LISTING_SCHEMA

SNAPSHOT_DDL = "url string, html string, fetch_date string"
# the listings-mode schema IS the extraction stage's schema — one source
# of truth (html_extract.LISTING_SCHEMA), not a re-derived copy
LISTING_DDL = LISTING_SCHEMA

_MODES = ("snapshots", "listings")
_NAME_MAX = 255  # common filesystem NAME_MAX; enforced, not discovered


def _validated_mode(options) -> str:
    mode = options.get("mode", "snapshots")
    if mode not in _MODES:
        raise ValueError(
            f"housing_snapshots: unknown mode {mode!r} — expected one of {_MODES}"
        )
    return mode


def snapshot_filename(url: str, fetch_date: str) -> str:
    name = f"{fetch_date}__{urllib.parse.quote(url, safe='')}.html"
    if len(name.encode()) > _NAME_MAX:
        raise ValueError(
            f"snapshot filename for url {url[:60]!r}… exceeds {_NAME_MAX} bytes "
            "after percent-encoding — store long-URL snapshots through a "
            "manifest-keyed layout instead of the filename convention"
        )
    return name


def parse_snapshot_filename(name: str) -> tuple[str, str]:
    """filename → (url, fetch_date); raises ValueError on non-conforming."""
    stem, ext = os.path.splitext(name)
    if ext != ".html" or "__" not in stem:
        raise ValueError(f"not a snapshot filename: {name!r}")
    fetch_date, enc = stem.split("__", 1)
    return urllib.parse.unquote(enc), fetch_date


def write_snapshot_dir(rows: Sequence[tuple[str, str, str]], path: str) -> None:
    """(url, html, fetch_date) rows → one file each under ``path`` (test
    fixture / ingest helper; the crawler writes the same convention).

    All filenames are validated BEFORE anything is written (no partial dir
    on a name error), and each file lands via tmp-write + ``os.rename`` so
    a concurrently running streaming reader never reads a half-written
    page (the tmp suffix does not match the readers' ``.html`` filter)."""
    named = [(snapshot_filename(url, fetch_date), html) for url, html, fetch_date in rows]
    os.makedirs(path, exist_ok=True)
    for name, html in named:
        final = os.path.join(path, name)
        tmp = final + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(html)
        os.rename(tmp, final)  # atomic on POSIX: readers see all or nothing


def _list_snapshots(path: str) -> list[str]:
    """The one filename filter both readers share."""
    return sorted(f for f in os.listdir(path) if f.endswith(".html") and "__" in f)


def _file_rows(path: str, name: str, mode: str) -> Iterator[tuple]:
    """One snapshot file → its rows under ``mode`` — the single row
    producer behind the batch partitions AND the streaming batches, so the
    two paths cannot diverge."""
    url, fetch_date = parse_snapshot_filename(name)
    with open(os.path.join(path, name)) as fh:
        html = fh.read()
    if mode == "snapshots":
        yield (url, html, fetch_date)
        return
    from .html_extract import _page_rows

    try:
        rows = _page_rows(url, html, fetch_date)
    except Exception:
        return  # per-page isolation: a malformed page loses itself only
    for r in rows:
        yield tuple(r)


class _SnapshotPartition(InputPartition):
    def __init__(self, dir_path: str, name: str):
        self.dir_path = dir_path
        self.name = name


class _SnapshotReader(DataSourceReader):
    def __init__(self, path: str, mode: str):
        if not path:
            raise ValueError("housing_snapshots requires a path (load(dir))")
        self.path = path
        self.mode = mode

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per file: Spark schedules pages across executors
        # like any file source; a page is the natural parse unit
        return [_SnapshotPartition(self.path, f) for f in _list_snapshots(self.path)]

    def read(self, partition: _SnapshotPartition) -> Iterator[tuple]:
        return _file_rows(partition.dir_path, partition.name, self.mode)


def _fetch_date_of(name: str) -> str:
    return name.split("__", 1)[0]


class _SnapshotStreamReader(SimpleDataSourceStreamReader):
    """Incremental snapshot ingest — the engine-side of the reference's
    cron-driven scrape loop (crontest.py / trulia_scrape.py main()): the
    crawler keeps dropping snapshot files, each microbatch picks up the
    files that arrived since the last offset.

    Offset = ``{"date": <watermark fetch_date>, "seen": [files already
    consumed AT that date]}``. A file is new iff its fetch_date is beyond
    the watermark, or equals it and the name is not in ``seen`` — so
    several files of the SAME fetch_date arriving across trigger
    boundaries are all picked up regardless of how their encoded URLs sort
    (a pure last-filename watermark would silently drop same-date files
    sorting below it). ``seen`` is bounded by one fetch_date's file count,
    never the full history. Contract: the crawler's fetch_dates are
    non-decreasing; a backfilled EARLIER date sorts behind the watermark
    and is skipped — run backfills through the batch reader instead.
    ``readBetweenOffsets`` replays any (start, end] window exactly, so
    recovery after a crash re-reads the same files."""

    def __init__(self, path: str, mode: str):
        if not path:
            raise ValueError("housing_snapshots stream requires a path")
        self.path = path
        self.mode = mode

    def initialOffset(self) -> dict:
        return {"date": "", "seen": []}

    def _new_since(self, offset: dict) -> list[str]:
        wdate, seen = offset.get("date", ""), set(offset.get("seen", []))
        return [
            f
            for f in _list_snapshots(self.path)
            if _fetch_date_of(f) > wdate
            or (_fetch_date_of(f) == wdate and f not in seen)
        ]

    def _rows_for(self, names: list[str]) -> list[tuple]:
        # materialized list, not a generator: the simple-reader runtime
        # prefetches on the driver and copy.copy()s the batch for replay —
        # a generator is unpicklable there. Batches are files-since-last-
        # trigger sized, the API's intended driver-side prefetch.
        out: list[tuple] = []
        for name in names:
            out.extend(_file_rows(self.path, name, self.mode))
        return out

    def read(self, start: dict) -> tuple[list[tuple], dict]:
        names = self._new_since(start)
        if not names:
            return [], dict(start)
        new_date = max(start.get("date", ""), max(_fetch_date_of(f) for f in names))
        consumed = set(start.get("seen", [])) | set(names)
        end = {
            "date": new_date,
            "seen": sorted(f for f in consumed if _fetch_date_of(f) == new_date),
        }
        return self._rows_for(names), end

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        new_at_start = set(self._new_since(start))
        still_new_at_end = set(self._new_since(end))
        return self._rows_for(sorted(new_at_start - still_new_at_end))


class HousingSnapshotDataSource(DataSource):
    """``spark.dataSource.register(HousingSnapshotDataSource)`` then
    ``spark.read.format("housing_snapshots").load(dir)`` (batch) or
    ``spark.readStream.format("housing_snapshots").load(dir)``
    (incremental microbatches over newly arriving snapshot files)."""

    @classmethod
    def name(cls) -> str:
        return "housing_snapshots"

    def schema(self) -> StructType | str:
        if _validated_mode(self.options) == "listings":
            return LISTING_DDL
        return SNAPSHOT_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SnapshotReader(self.options.get("path", ""), _validated_mode(self.options))

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _SnapshotStreamReader(
            self.options.get("path", ""), _validated_mode(self.options)
        )
