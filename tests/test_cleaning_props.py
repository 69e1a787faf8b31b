"""Property-based cleaning tests (SURVEY.md §5.2 item 5, hypothesis).

Round-trip laws the cleaning expressions must satisfy for ALL inputs, not
just the golden rows: format-then-clean is identity for prices/sqft, and
range-midpoint equals (lo+hi)/2 exactly. Each property batches all generated
examples into ONE Spark job (hypothesis drives data generation; Spark runs
once per property) so the suite stays fast.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_housing_spark.functions.cleaning import clean_price, clean_sqft, range_midpoint

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from etl_housing_spark.session import get_session

        _spark = get_session(app_name="ehs-tests", shuffle_partitions=8)
    return _spark


def _fmt_thousands(n: int) -> str:
    return f"{n:,}"


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**7), min_size=1, max_size=50))
def test_price_clean_roundtrip(ns):
    """int → '$1,234' (+ optional '+') → clean_price → cast == identity."""
    spark = _get_spark()
    rows = [(i, n, f"${_fmt_thousands(n)}" + ("+" if i % 2 else "")) for i, n in enumerate(ns)]
    df = spark.createDataFrame(rows, "i long, expected long, raw string")
    out = df.withColumn("got", clean_price("raw").cast("long")).collect()
    for r in out:
        assert r.got == r.expected


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=10**6), min_size=1, max_size=50))
def test_sqft_clean_roundtrip(ns):
    """int → '1,234 sqft' → clean_sqft → cast == identity."""
    spark = _get_spark()
    rows = [(i, n, f"{_fmt_thousands(n)} sqft") for i, n in enumerate(ns)]
    df = spark.createDataFrame(rows, "i long, expected long, raw string")
    out = df.withColumn("got", clean_sqft("raw").cast("long")).collect()
    for r in out:
        assert r.got == r.expected


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),
            st.integers(min_value=0, max_value=10**6),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_range_midpoint_law(pairs):
    """midpoint('lo-hi') == (lo+hi)/2 for arbitrary non-negative int pairs."""
    spark = _get_spark()
    rows = [(i, lo, hi, f"{lo}-{hi}") for i, (lo, hi) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "i long, lo long, hi long, raw string")
    out = df.withColumn("got", range_midpoint("raw")).collect()
    for r in out:
        assert r.got == (r.lo + r.hi) / 2


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=50))
def test_midpoint_of_plain_value_is_identity(ns):
    """non-range input passes through unchanged (P6 masked update: only
    matching rows are rewritten)."""
    spark = _get_spark()
    df = spark.createDataFrame([(n, str(n)) for n in ns], "expected long, raw string")
    out = df.withColumn("got", range_midpoint("raw").cast("long")).collect()
    for r in out:
        assert r.got == r.expected
