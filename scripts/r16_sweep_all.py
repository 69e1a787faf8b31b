#!/usr/bin/env python
"""One-pass isolated cold timing of EVERY registered query through the noop
sink (guide §1.1 measure first), pipeline cache drained per query — the
catalog-wide outlier hunt. Streaming ids run their normal function (the
registered fns are all batch-returning)."""

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
    specs = all_queries()
    spark = get_session(app_name="r16-sweep-all")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name in sorted(specs):
        clear_pipeline_cache()
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        try:
            df = specs[name].fn(spark, sf_dir)
            t_plan = time.perf_counter() - t0
            df.write.format("noop").mode("overwrite").save()
            t_all = time.perf_counter() - t0
            rows.append((t_all, t_plan, name, ""))
            print(f"{name}: total {t_all:6.2f}s (mk {t_plan:5.2f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            rows.append((-1.0, -1.0, name, repr(e)[:120]))
            print(f"{name}: ERR {e!r}", flush=True)
        spark.sparkContext.setJobDescription(None)
    clear_pipeline_cache()
    print("==== slowest 40 ====")
    for t_all, t_plan, name, err in sorted(rows, reverse=True)[:40]:
        print(f"{t_all:8.2f}s  mk {t_plan:5.2f}s  {name} {err}")
    spark.stop()


if __name__ == "__main__":
    main()
