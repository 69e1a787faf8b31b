#!/usr/bin/env python
"""Round-16 writer-heap isolation (VERDICT r15 item 1).

The r15 session observed the sf30 cell-partitioned artifact write OOM an
8 g driver heap and diagnosed heap ∝ open-writer count. This probe tests
the WRITE PHASE alone, holding the data fixed: read the existing sf30
serve artifacts back (600k vectors, 775 cells) and re-write them
partitionBy(cid) under a bounded heap, in two shapes:

  old   repartition(cid) → partitionBy(cid)                (the r15 shape)
  new   repartition(cid) → sortWithinPartitions(cid) → …   (the r16 fix)

Usage: SPARK_GRAFT_DRIVER_MEM=8g python scripts/r16_writer_probe.py [old|new|both]
Prints one JSON line per shape with wall seconds and rc.
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from etl_housing_spark.session import get_session  # noqa: E402

SRC = "/tmp/ehs_ann_idx_root_repo_benchwh_sf30"
DST = "/tmp/r16_writer_probe"


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    spark = get_session(app_name="r16-writer-probe")
    spark.sparkContext.setLogLevel("WARN")
    heap = spark.conf.get("spark.driver.memory")
    assign = spark.read.parquet(SRC + "/assign_by_cell").select(
        "vec_id", "v", "cid"
    )
    n = assign.count()
    shapes = ["old", "new"] if which == "both" else [which]
    for shape in shapes:
        dst = f"{DST}_{shape}"
        shutil.rmtree(dst, ignore_errors=True)
        df = assign.repartition("cid")
        if shape == "new":
            df = df.sortWithinPartitions("cid")
        t0 = time.perf_counter()
        try:
            df.write.mode("overwrite").partitionBy("cid").parquet(dst)
            rc = "ok"
        except Exception as e:  # noqa: BLE001
            rc = f"{type(e).__name__}: {e}"[:300]
        wall = round(time.perf_counter() - t0, 1)
        ncells = (
            sum(1 for d in os.listdir(dst) if d.startswith("cid="))
            if os.path.isdir(dst)
            else 0
        )
        print(
            json.dumps(
                {
                    "shape": shape,
                    "heap": heap,
                    "rows": n,
                    "wall_s": wall,
                    "cells_written": ncells,
                    "rc": rc,
                }
            ),
            flush=True,
        )
        shutil.rmtree(dst, ignore_errors=True)


if __name__ == "__main__":
    main()
