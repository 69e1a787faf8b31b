#!/usr/bin/env python
"""Per-query DuckDB yardstick for the bench set (BASELINE.md ratio table).

Runs each bench-tagged query's oracle SQL in DuckDB against the SAME parquet
files the Spark bench reads (default sf0.1), with the table names
pre-registered as views — the identical setup the correctness driver uses.
Prints one JSON line: {"total": s, "queries": {...}, "threads": n, "sf_dir": d}.

Timing protocol mirrors bench.py: one warmup execution per query (not
billed), then a timed pass that fully materializes each result
(``fetchall``). DuckDB has no separate plan-cache step worth isolating at
this scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    threads = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4)))

    from etl_housing_spark.plans import all_queries

    specs = {n: s for n, s in all_queries().items() if "bench" in s.tags and s.oracle}

    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    timings: dict[str, float] = {}
    for name in sorted(specs):
        sql = specs[name].oracle
        con.execute(sql).fetchall()  # warmup (parse + buffer cache)
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"{name}: {timings[name]:.4f}s", file=sys.stderr)

    print(json.dumps({
        "total": round(sum(timings.values()), 4),
        "queries": timings,
        "threads": threads,
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
