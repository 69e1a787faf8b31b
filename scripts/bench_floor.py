#!/usr/bin/env python
"""Whole-catalog analysis-floor sweep (SCALE.md 'fleet-level budget').

For EVERY registered query at sf0.001: time DataFrame construction (plan
building + eager Catalyst analysis) separately from execution (noop-sink
materialize), clear_pipeline_cache() between ids. Prints per-family and
top-payer summaries plus one JSON line with per-query numbers.

Usage: python scripts/bench_floor.py [sf_dir]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bench import materialize
from etl_housing_spark.operators._ckpt import clear_pipeline_cache
from etl_housing_spark.plans import all_queries
from etl_housing_spark.session import get_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    specs = all_queries()
    spark = get_session(app_name="ehs-floor-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    # JVM warmup so the first id doesn't absorb session start
    materialize(specs["q_count"].fn(spark, sf_dir))
    clear_pipeline_cache()
    rows = {}
    failures = []
    for name in sorted(specs):
        spec = specs[name]
        try:
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            t0 = time.perf_counter()
            materialize(df)
            t_exec = time.perf_counter() - t0
            rows[name] = {
                "build_s": round(t_build, 3),
                "exec_s": round(t_exec, 3),
                "family": spec.tags[0] if spec.tags else "other",
            }
        except Exception as e:  # noqa: BLE001 — sweep must finish
            failures.append((name, repr(e)[:200]))
        finally:
            clear_pipeline_cache()
    n = len(rows)
    tb = sum(r["build_s"] for r in rows.values())
    te = sum(r["exec_s"] for r in rows.values())
    print(f"\n{n}/{len(specs)} queries, {len(failures)} failures: "
          f"construction {tb:.1f} s total, execution {te:.1f} s total", file=sys.stderr)
    fam: dict[str, float] = {}
    for r in rows.values():
        fam[r["family"]] = fam.get(r["family"], 0.0) + r["build_s"]
    for f, s in sorted(fam.items(), key=lambda kv: -kv[1]):
        print(f"  build {f}: {s:.1f} s", file=sys.stderr)
    top = sorted(rows.items(), key=lambda kv: -kv[1]["build_s"])[:8]
    for name, r in top:
        print(f"  top payer {name}: build {r['build_s']:.1f} s", file=sys.stderr)
    for name, err in failures:
        print(f"  FAIL {name}: {err}", file=sys.stderr)
    print(json.dumps({"n": n, "build_total_s": round(tb, 1),
                      "exec_total_s": round(te, 1), "queries": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
