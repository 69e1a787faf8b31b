#!/usr/bin/env python
"""DuckDB half of the sf30 pipeline measurement (scripts/bench_sf30_pipeline.py
runs both engines in one process; at sf30 the DuckDB side alone runs tens of
minutes, so it is split out to survive shell timeouts). Identical protocol:
one warmup execution per query (parse + buffer cache), one timed fetchall.

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bench import _load_snapshot  # noqa: E402
from etl_housing_spark.plans import all_queries  # noqa: E402

QUERIES = (
    "q_minhash_pairs_portable",
    "q_dedup_pipeline_portable",
    "q_corpus_pipeline",
)
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", ".benchdata/sf30")
    specs = all_queries()

    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 4}")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    load_start = _load_snapshot()
    dk: dict[str, float] = {}
    for name in QUERIES:
        sql = specs[name].oracle
        t0 = time.perf_counter()
        con.execute(sql).fetchall()  # warmup (protocol parity with bench_duckdb.py)
        wu = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        dk[name] = round(time.perf_counter() - t0, 3)
        print(f"duckdb {name}: warmup {wu}s timed {dk[name]}s", file=sys.stderr, flush=True)

    print(json.dumps({
        "sf_dir": sf_dir,
        "duckdb": dk,
        "duckdb_total": round(sum(dk.values()), 3),
        "load_start": load_start, "load_end": _load_snapshot(),
    }))


if __name__ == "__main__":
    main()
