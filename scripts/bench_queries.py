#!/usr/bin/env python
"""Measure arbitrary catalog queries Spark-vs-DuckDB on the same parquet.

Usage: python scripts/bench_queries.py q_corr_matrix q_lsh_eval ...
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

For each id: one warmup + one timed pass on each engine (Spark through the
noop sink — full computation, no driver transfer; DuckDB fetches, which is
how BASELINE.md's yardstick is defined). Prints a markdown table + one JSON
line. Run on an idle machine; compare ratios, not seconds (BASELINE.md).
Queries without an oracle get a Spark time and a null DuckDB cell.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

import duckdb

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bench import materialize
from etl_housing_spark.catalog import TABLES
from etl_housing_spark.plans import all_queries
from etl_housing_spark.session import get_session


def main() -> None:
    ids = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not ids:
        sys.exit("usage: bench_queries.py <query_id> [...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = all_queries()
    unknown = [i for i in ids if i not in specs]
    if unknown:
        sys.exit(f"unknown ids: {unknown}")

    spark = get_session(app_name="ehs-bench-queries")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    from etl_housing_spark.operators._ckpt import clear_pipeline_cache

    load_start = os.getloadavg()[0]  # BEFORE any work — the idle evidence
    rows = []
    for name in ids:
        spec = specs[name]
        materialize(spec.fn(spark, sf_dir))  # warmup (JIT/codegen)
        # warmup residency is not the timed state (bench.py's discipline):
        # drain tracked persists/checkpoints so the timed pass is cold
        clear_pipeline_cache(spark)
        t0 = time.time()
        materialize(spec.fn(spark, sf_dir))
        s_sec = time.time() - t0
        d_sec = None
        if spec.oracle:
            con.execute(spec.oracle).fetchall()  # warmup
            t0 = time.time()
            con.execute(spec.oracle).fetchall()
            d_sec = time.time() - t0
        rows.append((name, s_sec, d_sec))
        print(
            f"| {name} | {s_sec:.2f} | "
            + (f"{d_sec:.2f} | {s_sec / d_sec:.2f}x |" if d_sec else "— | — |"),
            file=sys.stderr,
        )

    print(json.dumps({
        "sf_dir": sf_dir,
        "load_start": load_start,
        "load_end": os.getloadavg()[0],
        "queries": {n: {"spark_s": round(s, 3),
                        "duckdb_s": round(d, 3) if d else None}
                    for n, s, d in rows},
    }))


if __name__ == "__main__":
    main()
