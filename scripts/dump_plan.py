#!/usr/bin/env python
"""Dump .explain("formatted") for registered queries to stdout (r16
deliverable: plans/r16/<query>_{before,after}.txt).

Usage: SPARK_GRAFT_SF_DIR=... python scripts/dump_plan.py q_a [q_b ...]
Each query's formatted plan is printed between BEGIN/END markers so a
multi-query run can be split; single-query runs redirect straight to the
artifact file.
"""

from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from etl_housing_spark.operators._ckpt import clear_pipeline_cache  # noqa: E402
from etl_housing_spark.plans import all_queries  # noqa: E402
from etl_housing_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    specs = all_queries()
    spark = get_session(app_name="ehs-dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    for name in sys.argv[1:]:
        df = specs[name].fn(spark, sf_dir)
        print(f"===== BEGIN {name} =====")
        print(df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        ))
        print(f"===== END {name} =====")
        clear_pipeline_cache()
    spark.stop()


if __name__ == "__main__":
    main()
