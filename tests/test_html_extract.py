"""HTML extraction (S2) + full scrape-pipeline end-to-end (SURVEY §3.1):
snapshot table → mapInPandas extract → clean_listings → partitioned CSV →
read-back — the whole trulia_scrape.py main() as one distributed flow."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_housing_spark.functions.cleaning import clean_listings
from etl_housing_spark.sources.html_extract import SNAPSHOT_SCHEMA, extract_listings
from etl_housing_spark.sources.partitioned_csv import (
    read_partitioned_csv,
    write_partitioned_csv,
)


def _page(name: str, city: str, rows: list[tuple[str, str, str, str, str]]) -> str:
    trs = "".join(
        f"""<tr>
          <td class="FloorPlanTable__FloorPlanCell-sc-1ghu3y7-2"><div color="highlight">{unit}</div></td>
          <td class="FloorPlanTable__FloorPlanSMCell-sc-1ghu3y7-8">ignored</td>
          <td class="FloorPlanTable__FloorPlanSMCell-sc-1ghu3y7-8">{price}</td>
          <td class="FloorPlanTable__FloorPlanFloorSpaceCell-sc-1ghu3y7-5">{sqft}</td>
          <td class="FloorPlanTable__FloorPlanFeaturesCell-sc-1ghu3y7-4">{bed}</td>
          <td class="FloorPlanTable__FloorPlanFeaturesCell-sc-1ghu3y7-4">{bath}</td>
        </tr>"""
        for (unit, sqft, bed, bath, price) in rows
    )
    return f"""<html><body>
      <span data-testid="home-details-summary-headline">{name}</span>
      <span data-testid="home-details-summary-city-state">1 Main St</span>
      <span data-testid="home-details-summary-city-state">{city}, TX 78758</span>
      <div data-testid="home-description-text-description-text">Nice place</div>
      <ul>
        <li class="FeatureList__FeatureListItem-iipbki-0">Cats OK</li>
        <li class="FeatureList__FeatureListItem-iipbki-0">Pool</li>
      </ul>
      <table data-testid="floor-plan-group"><tbody>{trs}</tbody></table>
    </body></html>"""


def test_extract_fields(spark):
    html = _page("The Arbors", "Austin", [("A1", "525 sqft", "1bd", "1ba", "$850"),
                                          ("B2", "1,050 sqft", "2bd", "2ba", "$1,275+")])
    snaps = spark.createDataFrame([("http://x/1", html, "2020-05-01")], SNAPSHOT_SCHEMA)
    rows = extract_listings(snaps).orderBy("unit").collect()
    assert len(rows) == 2
    r = rows[0]
    assert (r.name, r.unit, r.sqft, r.bed, r.bath, r.price) == (
        "The Arbors", "A1", "525 sqft", "1bd", "1ba", "$850"
    )
    assert (r.city, r.state, r.zipcode) == ("Austin", "TX", "78758")
    assert r.details == "Cats OK ,Pool"
    assert r.date == "2020-05-01" and r.url == "http://x/1"


def test_malformed_page_isolated(spark):
    good = _page("Good Apts", "Austin", [("A1", "500 sqft", "1bd", "1ba", "$900")])
    snaps = spark.createDataFrame(
        [("http://x/good", good, "2020-05-01"),
         ("http://x/bad", "<table data-testid='floor-plan-group'><tr><td>no fields", "2020-05-01"),
         ("http://x/empty", "<html><body>nothing here</body></html>", "2020-05-01")],
        SNAPSHOT_SCHEMA,
    )
    out = extract_listings(snaps)
    # the bad page yields a row with blank fields or none — never an exception;
    # the empty page yields no floor-plan rows at all
    assert out.filter(F.col("url") == "http://x/empty").count() == 0
    assert out.filter(F.col("url") == "http://x/good").count() == 1


def test_scrape_pipeline_end_to_end(spark, tmp_path):
    pages = [
        ("http://x/arbors", _page("Arbors", "Austin", [("A1", "525 sqft", "1bd", "1ba", "$850"),
                                                       ("A2", "600-800 sqft", "Studio", "1ba", "$1,050+")]), "2020-05-01"),
        ("http://x/lofts", _page("Lofts", "Dallas", [("L1", "900 sqft", "2bd", "2ba", "$1,400")]), "2020-05-01"),
        ("http://x/ranges", _page("Ranges", "Austin", [("R1", "700 sqft", "1bd", "1ba", "$800-$900")]), "2020-05-02"),
    ]
    snaps = spark.createDataFrame(pages, SNAPSHOT_SCHEMA)
    clean = clean_listings(extract_listings(snaps))  # trulia_scrape.py §3.1 steps 4-6
    out_dir = str(tmp_path / "daily_scrape")
    write_partitioned_csv(clean, out_dir, ["city", "date"])  # step 7 sink

    back = read_partitioned_csv(
        spark, out_dir,
        "name string, address string, unit string, sqft int, bed float, bath float, "
        "price int, state string, zipcode int, description string, details string, url string",
    )
    got = {(r.unit): (r.price, r.sqft, r.bed) for r in back.collect()}
    # price-range row R1 dropped (P4); studio bed → 0; sqft range → midpoint
    assert got == {"A1": (850, 525, 1.0), "A2": (1050, 700, 0.0), "L1": (1400, 900, 2.0)}
    # partition pruning on the path-encoded city/date works end to end
    austin = back.filter((F.col("city") == "Austin") & (F.col("date") == "2020-05-01"))
    assert austin.count() == 2
