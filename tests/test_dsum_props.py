"""Property tests for the cross-engine decimal-exact sum (_util.dsum) — the
foundation 200+ oracle parities stand on.

Laws, for arbitrary double lists within the documented magnitude bound:
1. Spark's dsum equals DuckDB's CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)
   bit for bit (the cross-engine contract).
2. The value is invariant under partitioning (1 vs 16 shuffle partitions) —
   the order-independence that makes the oracle comparison meaningful on a
   cluster.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_housing_spark.plans._util import dsum

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from etl_housing_spark.session import get_session

        _spark = get_session(app_name="ehs-tests", shuffle_partitions=8)
    return _spark


# magnitudes within the documented (18,6) per-element bound (|x| < 1e12),
# with awkward fractions that do NOT round-trip through 6 decimals exactly
_vals = st.floats(
    min_value=-1e9,
    max_value=1e9,
    allow_nan=False,
    allow_infinity=False,
    width=64,
)


@settings(max_examples=15, deadline=None)
@given(st.lists(_vals, min_size=1, max_size=60))
def test_dsum_matches_duckdb_bitwise(xs):
    spark = _get_spark()
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = df.agg(dsum("x").alias("s")).collect()[0].s
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(x,) for x in xs])
    want = con.execute(
        "SELECT CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) FROM t"
    ).fetchone()[0]
    assert got == want, (got, want, xs[:5])


@settings(max_examples=10, deadline=None)
@given(st.lists(_vals, min_size=2, max_size=60))
def test_dsum_partitioning_invariant(xs):
    spark = _get_spark()
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    one = df.coalesce(1).agg(dsum("x").alias("s")).collect()[0].s
    many = df.repartition(16).agg(dsum("x").alias("s")).collect()[0].s
    rev = (
        spark.createDataFrame([(x,) for x in reversed(xs)], "x double")
        .repartition(16, F.rand(seed=7))
        .agg(dsum("x").alias("s"))
        .collect()[0]
        .s
    )
    assert one == many == rev
