from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from etl_housing_spark.session import get_session  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
# Override to re-run the oracle-parity sweep at another scale factor
# (EHS_SF_CORRECT=/root/testdata/sf0.1 python -m pytest tests/test_oracle_parity.py)
SF_CORRECT = os.environ.get("EHS_SF_CORRECT", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_session(app_name="ehs-tests", shuffle_partitions=8)
    yield s
    s.stop()
