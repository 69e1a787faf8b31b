"""Config-driven ETL composer tests (S14 / advanced.ipynb parity): registry
sources feed declared transform chains into sinks; the Engine loop isolates
job failures."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_housing_spark.functions.cleaning import clean_listings
from etl_housing_spark.pipeline import Engine, ETLJob
from etl_housing_spark.sources.registry import SourceRegistry
from etl_housing_spark.sources.warehouse import ParquetWarehouse


def test_job_composes_source_transforms_sink(spark, tmp_path):
    reg = SourceRegistry()
    reg.register_records(
        "listings_api",
        [
            {"name": "a1", "sqft": "500 sqft", "bed": "1bd", "bath": "1ba",
             "price": "$850", "zipcode": "78758"},
            {"name": "a2", "sqft": "", "bed": "2bd", "bath": "2ba",
             "price": "$950", "zipcode": "78758"},
        ],
        "name string, sqft string, bed string, bath string, price string, zipcode string",
    )
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    job = ETLJob(
        source="listings_api",
        transforms=[clean_listings, lambda df: df.filter(F.col("price") > 800)],
        sink=lambda df: wh.write(df, "clean_listings"),
    )
    out = job.run(spark, reg)
    assert out.count() == 1  # empty-sqft row dropped by the cleaning stage
    stored = wh.read("clean_listings").first()
    assert stored.price == 850 and stored.sqft == 500


def test_engine_isolates_job_failures(spark):
    reg = SourceRegistry()
    reg.register_records("good", [{"x": 1}], "x long")
    eng = Engine(reg)
    eng.register("ok", ETLJob(source="good"))
    eng.register("broken", ETLJob(source="missing_source"))
    results = eng.run_all(spark)
    assert results["ok"].count() == 1
    assert isinstance(results["broken"], Exception)


def test_cli_list_oracle_and_run(spark, capsys):
    from etl_housing_spark.__main__ import main

    assert main(["list", "--tag", "tpch"]) == 0
    out = capsys.readouterr().out
    assert "q_forecast_revenue" in out and "oracle" in out
    assert main(["oracle", "q_topk"]) == 0
    assert "SELECT" in capsys.readouterr().out.upper()
    assert main(["run", "q_topk", "--sf-dir", "/root/testdata/sf0.001", "--limit", "3"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip().startswith("{")]
    assert len(lines) == 3 and "o_totalprice" in lines[0]
    assert main(["oracle", "nope"]) == 2
    assert main(["run", "nope"]) == 2
