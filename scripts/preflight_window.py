#!/usr/bin/env python
"""Pre-flight a set of query ids through the driver-replica parity harness.

Usage: python scripts/preflight_window.py q_a q_b ...   (default: the
round-14 new/changed-oracle ids). Runs each id's Spark form and oracle SQL
at sf0.01 through tests/parity.assert_parity (the type-strict, bit-exact
local replica of the driver's hash check) and prints ok/FAIL per id.
"""

from __future__ import annotations

import pathlib
import sys
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tests"))

from parity import assert_parity  # noqa: E402

from etl_housing_spark.operators._ckpt import clear_pipeline_cache  # noqa: E402
from etl_housing_spark.plans import all_queries  # noqa: E402
from etl_housing_spark.session import get_session  # noqa: E402

R14_DEFAULT = [
    "q_ivfpq_scaled",
    "q_ivfpq_recall_scaled",
    "q_ann_index_persist",
    "q_ann_index_incremental",
]


def main() -> int:
    ids = sys.argv[1:] or R14_DEFAULT
    sf_dir = "/root/testdata/sf0.01"
    specs = all_queries()
    spark = get_session(app_name="ehs-preflight")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"WINDOW: {ids}")
    failures = 0
    for name in ids:
        try:
            # inside the try: an unknown/typo'd id counts as that id's
            # FAILURE (with the per-id accounting and the spark.stop()
            # below), instead of a KeyError aborting the whole preflight
            # (ADVICE r13)
            spec = specs[name]
            if spec.oracle:
                assert_parity(spark, spec, sf_dir)
                print(f"{name}: hash OK")
            else:
                n = spec.fn(spark, sf_dir).count()
                print(f"{name}: rows-only, {n} rows")
        except Exception:
            failures += 1
            print(f"{name}: FAIL")
            traceback.print_exc()
        finally:
            clear_pipeline_cache()
    print(f"preflight: {len(ids) - failures} ok / {failures} fail")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
