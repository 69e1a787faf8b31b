#!/usr/bin/env python
"""Round-16 instrument: run the serve-artifact build (the exact
``_write_serve_artifacts`` engine path) at an arbitrary SF under the
DEFAULT driver heap, to (a) reproduce the r15 finding that the sf30
cell-partitioned artifact write OOMs 8 g, then (b) verify the sorted
single-writer fix completes at the same heap (VERDICT r15 item 1).

Usage:
    SPARK_GRAFT_SF_DIR=.benchdata/sf30 python scripts/r16_sf30_build.py

Heap comes from SPARK_GRAFT_DRIVER_MEM (engine default 8g — the point).
Prints one JSON line with build seconds, kc, file counts, and peak RSS.
"""

from __future__ import annotations

import json
import os
import pathlib
import resource
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bench import ingest_layout  # noqa: E402
from etl_housing_spark.operators._ckpt import clear_pipeline_cache  # noqa: E402
from etl_housing_spark.plans.vector_queries import (  # noqa: E402
    _index_dir,
    _write_serve_artifacts,
)
from etl_housing_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", ".benchdata/sf30")
    suffix = os.environ.get("R16_SUFFIX", "_r16probe")
    spark = get_session(app_name="r16-sf30-build")
    spark.sparkContext.setLogLevel("WARN")
    heap = spark.conf.get("spark.driver.memory")
    # route through the bench ingest relayout — the raw benchdata
    # embeddings file is a single-row-group monolith (the r14 disease:
    # one row group = one effective scan partition; a first attempt read
    # it directly and spent 65+ min in ONE assignment task)
    sf_dir = ingest_layout(spark, sf_dir)

    t0 = time.perf_counter()
    p_assign, p_cells, p_cb, p_codes, kc, nprobe = _write_serve_artifacts(
        spark, sf_dir, suffix=suffix
    )
    build_s = round(time.perf_counter() - t0, 1)
    clear_pipeline_cache()

    out = _index_dir(sf_dir) + suffix
    counts = {}
    for sub in ("assign_by_cell", "codes"):
        root = os.path.join(out, sub)
        nfiles = sum(
            1
            for _r, _d, fs in os.walk(root)
            for f in fs
            if f.endswith(".parquet")
        )
        ndirs = sum(1 for d in os.listdir(root) if d.startswith("cid="))
        counts[sub] = {"files": nfiles, "cell_dirs": ndirs}

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "driver_mem": heap,
                "build_s": build_s,
                "kc": kc,
                "nprobe": nprobe,
                "rows_assign": p_assign.count(),
                "rows_codes": p_codes.count(),
                "layout": counts,
                "peak_rss_gb": round(
                    resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
