#!/usr/bin/env python
"""Benchmark runner — headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints exactly ONE JSON line on stdout:
  {"metric": "bench_total", "value": <total sec>, "unit": "sec",
   "queries": {"q_...": sec, ...}, "sf": <sf>}

Methodology:
- queries tagged 'bench' in the catalog (scan+agg, joins, windows, top-k,
  streaming-shaped window agg, text, vectors, dedup);
- each materialized via the noop sink (full computation, zero driver
  transfer — measures the engine, not toPandas);
- one tiny warmup pass first so JVM/codegen warmup isn't billed to the
  first query;
- headline "value"/"queries" = first timed pass (includes per-query
  planning + codegen — what a one-shot run pays); "queries_warm"/
  "warm_total" = a second pass of the identical plans (steady-state
  engine throughput, the number comparable across data sizes);
- session: local[$SPARK_GRAFT_CPUS], AQE on, shuffle partitions = cores
  (BASELINE.md configuration notes).

Diagnostics go to stderr; --explain dumps formatted plans instead of timing.
"""

from __future__ import annotations

import json
import os
import sys
import time

from etl_housing_spark.plans import all_queries
from etl_housing_spark.session import get_session


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0
    explain = "--explain" in sys.argv

    specs = {n: s for n, s in all_queries().items() if "bench" in s.tags}
    spark = get_session(app_name="ehs-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: touch parquet reader + codegen once (not billed)
    materialize(specs["q_groupby_avg"].fn(spark, sf_dir).limit(1))

    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in sorted(specs):
        df = specs[name].fn(spark, sf_dir)
        if explain:
            print(f"==== {name}", file=sys.stderr)
            df.explain(mode="formatted")
            continue
        t0 = time.perf_counter()
        materialize(df)
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 4)
        t1 = time.perf_counter()
        materialize(specs[name].fn(spark, sf_dir))
        warm[name] = round(time.perf_counter() - t1, 4)
        print(f"{name}: {dt:.3f}s (warm {warm[name]:.3f}s)", file=sys.stderr)

    if not explain:
        total = round(sum(timings.values()), 4)
        print(json.dumps({
            "metric": "bench_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "queries_warm": warm,
            "warm_total": round(sum(warm.values()), 4),
            "sf": sf,
        }))
    spark.stop()


if __name__ == "__main__":
    main()
