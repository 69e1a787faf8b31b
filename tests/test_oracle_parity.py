"""Every oracle-checkable query must hash-match its DuckDB twin at sf0.01 —
the same gate the correctness driver applies (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from etl_housing_spark.plans import all_queries

from .conftest import SF_CORRECT
from .parity import assert_parity

SPECS = all_queries()
CHECKED = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", CHECKED)
def test_oracle_parity(spark, name):
    assert_parity(spark, SPECS[name], SF_CORRECT)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    df = SPECS[name].fn(spark, SF_CORRECT)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
