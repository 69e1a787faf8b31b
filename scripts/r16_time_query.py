#!/usr/bin/env python
"""Isolated cold-timing of registered queries through the noop sink
(guide §1.4), REPS cold passes with the pipeline cache drained between.

Usage: SPARK_GRAFT_SF_DIR=... REPS=3 python scripts/r16_time_query.py q_a [q_b ...]
"""

from __future__ import annotations

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from etl_housing_spark.operators._ckpt import clear_pipeline_cache  # noqa: E402
from etl_housing_spark.plans import all_queries  # noqa: E402
from etl_housing_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("REPS", "3"))
    specs = all_queries()
    spark = get_session(app_name="r16-time-query")
    spark.sparkContext.setLogLevel("ERROR")
    for name in sys.argv[1:]:
        for rep in range(reps):
            clear_pipeline_cache()
            spark.sparkContext.setJobDescription(f"{name}#{rep}")
            t0 = time.perf_counter()
            df = specs[name].fn(spark, sf_dir)
            t_plan = time.perf_counter() - t0
            df.write.format("noop").mode("overwrite").save()
            t_all = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            print(
                f"{name} rep{rep}: total {t_all:6.2f}s "
                f"(mk {t_plan:5.2f}s, action {t_all - t_plan:6.2f}s)",
                flush=True,
            )
        clear_pipeline_cache()
    spark.stop()


if __name__ == "__main__":
    main()
