#!/usr/bin/env python
"""Regenerate BASELINE.md's per-query ratio table (floor / marginal / DuckDB).

For each bench-tagged query:
- ``floor``   = wall-clock at sf0.001 after warmup (data cost ~0: measures
  Spark's fixed per-query cost — planning, codegen lookup, scheduling);
- ``spark``   = wall-clock at the bench SF (default sf0.1, ingest-relayout
  applied exactly as bench.py does);
- ``marginal``= spark − floor, the data-dependent cost that predicts scale;
- ``duckdb``  = the oracle SQL on the same parquet, same process, after one
  warmup execution.

Prints a GitHub-markdown table + one JSON line. Run on an idle machine;
cross-session drift is real (BASELINE.md "compare ratios, not seconds").
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

import duckdb

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bench import bucketed_layout, ingest_layout, join_sortmerge_bucketed, materialize
from etl_housing_spark.catalog import TABLES
from etl_housing_spark.plans import all_queries
from etl_housing_spark.session import get_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    floor_dir = os.environ.get("SPARK_GRAFT_FLOOR_DIR", "/root/testdata/sf0.001")
    specs = {n: s for n, s in all_queries().items() if "bench" in s.tags}

    spark = get_session(app_name="ehs-bench-ratios")
    spark.sparkContext.setLogLevel("ERROR")
    bench_dir = ingest_layout(spark, sf_dir)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # warmup: every query once at the floor SF and once at the bench SF
    for name in sorted(specs):
        materialize(specs[name].fn(spark, floor_dir))
        materialize(specs[name].fn(spark, bench_dir))
        if specs[name].oracle is not None:
            con.execute(specs[name].oracle).fetchall()

    # bucketed co-location variant: identical aggregation and DuckDB
    # yardstick as q_join_sortmerge, join-side exchanges pre-paid at ingest.
    # Floor uses the same bucketed tables (bucket count, not data, dominates
    # the fixed cost), so marginal isolates the data-dependent join work.
    bprefix = bucketed_layout(spark, bench_dir)
    materialize(join_sortmerge_bucketed(spark, bprefix))

    rows = []
    for name in sorted(specs):
        t0 = time.perf_counter()
        materialize(specs[name].fn(spark, floor_dir))
        floor = time.perf_counter() - t0
        t0 = time.perf_counter()
        materialize(specs[name].fn(spark, bench_dir))
        sp = time.perf_counter() - t0
        if specs[name].oracle is not None:
            t0 = time.perf_counter()
            con.execute(specs[name].oracle).fetchall()
            dk = time.perf_counter() - t0
        else:
            # ⊘ query (no SQL twin): Spark/floor/marginal still timed; the
            # DuckDB column and both ratio cells print "—" and the query is
            # excluded from the ratio totals (no yardstick to divide by).
            dk = None
        rows.append((name, sp, floor, max(0.0, sp - floor), dk))
        dks = f"{dk:.3f}" if dk is not None else "-"
        print(f"{name}: spark={sp:.3f} floor={floor:.3f} duckdb={dks}", file=sys.stderr)

    sortmerge_floor = next(r[2] for r in rows if r[0] == "q_join_sortmerge")
    t0 = time.perf_counter()
    materialize(join_sortmerge_bucketed(spark, bprefix))
    sp = time.perf_counter() - t0
    t0 = time.perf_counter()
    con.execute(specs["q_join_sortmerge"].oracle).fetchall()
    dk = time.perf_counter() - t0
    rows.append(("q_join_sortmerge_bucketed", sp, sortmerge_floor,
                 max(0.0, sp - sortmerge_floor), dk))
    print(f"q_join_sortmerge_bucketed: spark={sp:.3f} duckdb={dk:.3f}", file=sys.stderr)

    print("| query | spark (s) | floor (s) | marginal (s) | duckdb (s) | ratio | marginal ratio |")
    print("| --- | --- | --- | --- | --- | --- | --- |")
    tot = [0.0] * 4  # spark / floor / marginal / duckdb — ratio-eligible only
    for name, sp, fl, mg, dk in rows:
        if dk is not None:
            tot = [tot[0] + sp, tot[1] + fl, tot[2] + mg, tot[3] + dk]
            print(
                f"| {name} | {sp:.3f} | {fl:.3f} | {mg:.3f} | {dk:.3f} "
                f"| {sp / dk:.1f}× | {mg / dk:.1f}× |"
            )
        else:
            print(f"| {name} (⊘ no SQL twin) | {sp:.3f} | {fl:.3f} | {mg:.3f} | — | — | — |")
    print(
        f"| **total (ratio-eligible)** | **{tot[0]:.3f}** | **{tot[1]:.3f}** | **{tot[2]:.3f}** "
        f"| **{tot[3]:.3f}** | **{tot[0] / tot[3]:.1f}×** | **{tot[2] / tot[3]:.1f}×** |"
    )
    print(json.dumps({
        "spark_total": round(tot[0], 4),
        "floor_total": round(tot[1], 4),
        "marginal_total": round(tot[2], 4),
        "duckdb_total": round(tot[3], 4),
        "sf_dir": sf_dir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
