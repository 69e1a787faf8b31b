"""Spark 4 Python DataSource for snapshot dirs (sources/datasource.py):
format registration, file→partition scheduling, filename metadata
round-trip, and — the load-bearing law — listings-mode output equals the
mapInPandas extraction path over the equivalent snapshot frame."""

from __future__ import annotations

import pytest

from etl_housing_spark.sources.datasource import (
    HousingSnapshotDataSource,
    parse_snapshot_filename,
    snapshot_filename,
    write_snapshot_dir,
)
from tests.test_html_extract import _page


def _register(spark):
    spark.dataSource.register(HousingSnapshotDataSource)


def test_filename_roundtrip():
    url = "http://x.example/listing?id=42&page=1"
    name = snapshot_filename(url, "2020-05-01")
    assert parse_snapshot_filename(name) == (url, "2020-05-01")
    with pytest.raises(ValueError):
        parse_snapshot_filename("nounderscore.html")


def test_snapshots_mode_reads_one_row_per_file(spark, tmp_path):
    _register(spark)
    rows = [
        ("http://x/1", _page("A", "Austin", [("A1", "500 sqft", "1bd", "1ba", "$900")]), "2020-05-01"),
        ("http://x/2", _page("B", "Boston", [("B1", "700 sqft", "2bd", "1ba", "$1,200")]), "2020-05-02"),
    ]
    d = str(tmp_path / "snaps")
    write_snapshot_dir(rows, d)
    df = spark.read.format("housing_snapshots").load(d)
    got = {(r["url"], r["fetch_date"]) for r in df.collect()}
    assert got == {("http://x/1", "2020-05-01"), ("http://x/2", "2020-05-02")}
    # one partition per file — the file is the scheduling unit
    assert df.rdd.getNumPartitions() == 2


def test_listings_mode_equals_mapinpandas_path(spark, tmp_path):
    """The source-side extraction must produce exactly the rows the
    mapInPandas stage produces from the equivalent snapshot frame."""
    from etl_housing_spark.sources.html_extract import SNAPSHOT_SCHEMA, extract_listings

    _register(spark)
    rows = [
        ("http://x/1", _page("The Arbors", "Austin",
                             [("A1", "525 sqft", "1bd", "1ba", "$850"),
                              ("B2", "1,050 sqft", "2bd", "2ba", "$1,275+")]), "2020-05-01"),
        ("http://x/2", "<html><not really parseable", "2020-05-02"),
        ("http://x/3", _page("Elm Court", "Dallas",
                             [("C3", "800 sqft", "2bd", "1ba", "$1,100")]), "2020-05-03"),
    ]
    d = str(tmp_path / "snaps")
    write_snapshot_dir(rows, d)

    via_source = (
        spark.read.format("housing_snapshots").option("mode", "listings").load(d)
    )
    via_stage = extract_listings(spark.createDataFrame(rows, SNAPSHOT_SCHEMA))
    a = sorted(tuple(r) for r in via_source.collect())
    b = sorted(tuple(r) for r in via_stage.collect())
    assert a == b and len(a) == 3  # 2 + 0 (malformed page isolated) + 1


def test_stream_reader_incremental_microbatches(spark, tmp_path):
    """readStream over a snapshot dir: batch 1 sees the initial files,
    batch 2 sees ONLY the files that arrived in between (offset =
    watermark fetch_date + seen-at-date set), and the streaming rows
    compose with the normal extraction transform."""
    from etl_housing_spark.sources.html_extract import extract_listings

    _register(spark)
    d = str(tmp_path / "snapstream")
    ckpt = str(tmp_path / "ckpt")
    write_snapshot_dir(
        [("http://x/1", _page("A", "Austin", [("A1", "500 sqft", "1bd", "1ba", "$900")]), "2020-05-01")],
        d,
    )

    sink = str(tmp_path / "sink")

    def run_available():
        stream = spark.readStream.format("housing_snapshots").load(d)
        listings = extract_listings(stream)  # mapInPandas over a stream
        q = (
            listings.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "streaming query did not finish in time"
        return {
            (r["name"], r["unit"], r["date"])
            for r in spark.read.parquet(sink).collect()
        }

    first = run_available()
    assert first == {("A", "A1", "2020-05-01")}

    write_snapshot_dir(
        [("http://x/2", _page("B", "Boston", [("B2", "700 sqft", "2bd", "1ba", "$1,200")]), "2020-05-02")],
        d,
    )
    second = run_available()
    # same checkpoint -> the resumed run APPENDS only the new file's rows
    # (exactly-once: A is not re-read, B arrives once)
    assert second == {("A", "A1", "2020-05-01"), ("B", "B2", "2020-05-02")}


def test_stream_picks_up_same_date_files_across_triggers(spark, tmp_path):
    """Offset is (watermark date, seen-at-date), not a last-filename mark:
    a same-fetch_date file whose encoded URL sorts BEFORE the last consumed
    name must still be read by the next trigger (the silent-loss case of a
    pure lexicographic watermark)."""
    _register(spark)
    d = str(tmp_path / "snaps")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def run_available():
        q = (
            spark.readStream.format("housing_snapshots").load(d)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "streaming query did not finish in time"
        return {r["url"] for r in spark.read.parquet(sink).collect()}

    write_snapshot_dir([("http://zzz/9", "<html></html>", "2020-05-01")], d)
    assert run_available() == {"http://zzz/9"}
    # same date, URL sorts lexicographically BEFORE the consumed one
    write_snapshot_dir([("http://aaa/1", "<html></html>", "2020-05-01")], d)
    assert run_available() == {"http://zzz/9", "http://aaa/1"}


def test_invalid_mode_raises_at_plan_time(spark, tmp_path):
    _register(spark)
    d = str(tmp_path / "snaps")
    write_snapshot_dir([("http://x/1", "<html></html>", "2020-05-01")], d)
    with pytest.raises(Exception, match="unknown mode"):
        spark.read.format("housing_snapshots").option("mode", "listing").load(d).collect()


def test_overlong_url_rejected_before_any_file_lands(tmp_path):
    d = str(tmp_path / "snaps")
    long_url = "http://x.example/listing?" + "&".join(f"k{i}=v{i}" for i in range(60))
    with pytest.raises(ValueError, match="255 bytes"):
        write_snapshot_dir(
            [("http://ok/1", "<html></html>", "2020-05-01"),
             (long_url, "<html></html>", "2020-05-01")],
            d,
        )
    import os
    assert not os.path.exists(d) or os.listdir(d) == []  # nothing written
