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

# A leaked production fast-mode flag would fail 200+ oracle parities as
# opaque hash mismatches with nothing naming the cause — fail fast with
# the one-line diagnosis instead (plans/_util.py fast_sums()).
if os.environ.get("EHS_FAST_SUMS", "") == "1":
    raise RuntimeError(
        "EHS_FAST_SUMS=1 is set: the test suite verifies bit-exact oracle "
        "parity, which production fast-sum mode intentionally breaks. "
        "unset EHS_FAST_SUMS before running tests."
    )


@pytest.fixture(scope="session")
def spark():
    s = get_session(app_name="ehs-tests", shuffle_partitions=8)
    yield s
    s.stop()
