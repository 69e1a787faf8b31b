"""Golden messy-listing tests (SURVEY.md §5.2 item 2, FIXTURES.md).

One synthetic fixture reproducing every dirty pattern the reference's
``clean_apartment_df`` handles (observed in housing.db rows and handled at
trulia_scrape.py:160-171), with hand-computed expected output. This is the
regression net the reference never had.
"""

from __future__ import annotations

import pytest

from etl_housing_spark.functions.cleaning import clean_listings, validate_casts

RAW_COLS = "name address unit sqft bed bath price city state zipcode description details url date".split()


def _row(**kw):
    base = {
        "name": "Apt",
        "address": "1 Main St",
        "unit": "A",
        "sqft": "500 sqft",
        "bed": "1bd",
        "bath": "1ba",
        "price": "$850",
        "city": "Austin",
        "state": "TX",
        "zipcode": "78758",
        "description": "desc",
        "details": "cats ok ,dogs ok",
        "url": "http://x",
        "date": "2020-05-01",
    }
    base.update(kw)
    return tuple(base[c] for c in RAW_COLS)


@pytest.fixture(scope="module")
def golden(spark):
    rows = [
        _row(name="plain", sqft="525 sqft", price="$850", bed="1bd", bath="1ba"),
        _row(name="thousands", sqft="1,050 sqft", price="$1,050", bed="2bd", bath="2ba"),
        _row(name="plus_price", price="$1,050+"),
        _row(name="contact", price="Contact$900"),
        _row(name="range_sqft", sqft="600-800 sqft"),
        _row(name="studio", bed="Studio"),
        _row(name="null_bed", bed=None),
        _row(name="empty_sqft", sqft=""),  # dropped (trulia_scrape.py:161)
        _row(name="unit_only_sqft", sqft=" sqft"),  # '' only AFTER stripping — dropped (:160-161 order)
        _row(name="range_price", price="$800-$900"),  # dropped (:169)
        _row(name="blankish", description=" ", unit=" "),
        _row(name="half_bath", bath="1.5ba"),
    ]
    df = spark.createDataFrame(rows, ", ".join(f"{c} string" for c in RAW_COLS))
    out = clean_listings(df)
    return {r["name"]: r for r in out.collect()}, out


def test_dropped_rows(golden):
    by_name, _ = golden
    assert "empty_sqft" not in by_name  # sqft == '' filtered
    assert "unit_only_sqft" not in by_name  # ' sqft' strips to '' — filter runs post-strip
    assert "range_price" not in by_name  # price contains '-' filtered
    assert len(by_name) == 9


def test_sqft_cleaning(golden):
    by_name, _ = golden
    assert by_name["plain"]["sqft"] == 525
    assert by_name["thousands"]["sqft"] == 1050
    assert by_name["range_sqft"]["sqft"] == 700  # (600+800)/2 midpoint


def test_price_cleaning(golden):
    by_name, _ = golden
    assert by_name["plain"]["price"] == 850
    assert by_name["thousands"]["price"] == 1050
    assert by_name["plus_price"]["price"] == 1050
    assert by_name["contact"]["price"] == 900


def test_bed_bath(golden):
    by_name, _ = golden
    assert by_name["plain"]["bed"] == 1.0 and by_name["plain"]["bath"] == 1.0
    assert by_name["studio"]["bed"] == 0.0  # 'Studio' → 0
    assert by_name["null_bed"]["bed"] == 0.0  # NaN → 0 (trulia_scrape.py:168)
    assert by_name["half_bath"]["bath"] == 1.5


def test_blank_to_null(golden):
    by_name, _ = golden
    assert by_name["blankish"]["description"] is None
    assert by_name["blankish"]["unit"] is None


def test_types(golden):
    _, out = golden
    t = dict(out.dtypes)
    assert t["sqft"] == "int" and t["price"] == "int"
    assert t["bath"] == "float" and t["bed"] == "float"
    assert t["zipcode"] == "int" and t["date"] == "date"


def test_validate_casts_passes_on_clean(spark, golden):
    _, out = golden
    # post-cast validation: no non-null input silently nulled
    validate_casts(
        out,
        out.select("name", "sqft", "price"),
        {"sqft": "int", "price": "int"},
        key="name",
    )


def test_validate_casts_raises_on_dirty(spark):
    raw = spark.createDataFrame(
        [("k1", "abc")], "k string, v string"
    )
    # try_cast is the explicit silent-null path (ANSI cast would throw here)
    cast = raw.withColumn("v", raw.v.try_cast("int"))
    with pytest.raises(ValueError, match="cast produced NULL"):
        validate_casts(cast, raw, {"v": "int"}, key="k")
