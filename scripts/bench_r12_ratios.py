#!/usr/bin/env python
"""Round-12 per-query ratio + decade measurements (BASELINE.md protocol).

Measures the session's new queries — q_consensus_reps, q_ivfpq_sweep,
q_dedup_tiered — at sf0.1 (floor/marginal/DuckDB), then decade points at
sf1/sf10 for the consensus (the row the r11 verdict asked for: the linear
rep consensus succeeding at the duplicate density where the pair form
OOMs). DuckDB legs run with a 250 s interrupt cap (DNF is itself data).

Usage: python scripts/bench_r12_ratios.py [sf0.1|decade]
"""

from __future__ import annotations

import os
import pathlib
import sys
import threading
import time

import duckdb

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bench import ingest_layout, materialize
from etl_housing_spark.catalog import TABLES
from etl_housing_spark.operators._ckpt import clear_pipeline_cache
from etl_housing_spark.plans import all_queries
from etl_housing_spark.session import get_session

# override the measured set with R12_QUERIES="q_a,q_b" (whitespace ok)
NEW = [
    n.strip()
    for n in os.environ.get(
        "R12_QUERIES", "q_consensus_reps,q_ivfpq_sweep,q_dedup_tiered"
    ).split(",")
    if n.strip()
]
CAP_S = 250.0


def duck_capped(con, sql: str) -> float | None:
    """Oracle wall-clock, or None on DNF (interrupted at CAP_S).

    Runs on a CURSOR of its own so a stale interrupt cannot poison the
    shared connection: if the query finishes right at the cap, the
    watcher may fire after fetchall() returned — the flag then lands on
    this throwaway cursor, never on the caller's connection (which would
    misrecord the NEXT query as DNF). done is set before returning, and
    the watcher checks it again immediately before interrupting."""
    cur = con.cursor()
    done = threading.Event()

    def _watch():
        if not done.wait(CAP_S) and not done.is_set():
            cur.interrupt()

    w = threading.Thread(target=_watch, daemon=True)
    w.start()
    t0 = time.perf_counter()
    try:
        cur.execute(sql).fetchall()
        elapsed = time.perf_counter() - t0
        done.set()
        return elapsed
    except duckdb.InterruptException:
        return None
    finally:
        done.set()
        cur.close()


def run_sf01() -> None:
    specs = all_queries()
    spark = get_session(app_name="ehs-r12-ratios")
    spark.sparkContext.setLogLevel("ERROR")
    floor_dir = "/root/testdata/sf0.001"
    bench_dir = ingest_layout(spark, "/root/testdata/sf0.1")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.1/{t}.parquet'"
        )
    for name in NEW:  # warmup both SFs + oracle once (oracle capped too —
        # a DNF-class oracle would otherwise hang the warmup forever)
        materialize(specs[name].fn(spark, floor_dir))
        materialize(specs[name].fn(spark, bench_dir))
        duck_capped(con, specs[name].oracle)
        clear_pipeline_cache()
    print("| query (sf0.1) | spark (s) | floor (s) | marginal (s) | duckdb (s) | ratio | marginal ratio |")
    print("| --- | --- | --- | --- | --- | --- | --- |")
    for name in NEW:
        t0 = time.perf_counter()
        materialize(specs[name].fn(spark, floor_dir))
        fl = time.perf_counter() - t0
        clear_pipeline_cache()
        t0 = time.perf_counter()
        materialize(specs[name].fn(spark, bench_dir))
        sp = time.perf_counter() - t0
        clear_pipeline_cache()
        dk = duck_capped(con, specs[name].oracle)
        mg = max(0.0, sp - fl)
        if dk is None:
            print(f"| {name} | {sp:.3f} | {fl:.3f} | {mg:.3f} | DNF (>250 s) | — | — |")
        else:
            print(
                f"| {name} | {sp:.3f} | {fl:.3f} | {mg:.3f} | {dk:.3f} "
                f"| {sp / dk:.1f}x | {mg / dk:.1f}x |"
            )
    spark.stop()


def run_decade() -> None:
    specs = all_queries()
    spark = get_session(app_name="ehs-r12-decade")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup at sf0.01 per protocol
    for name in ["q_consensus_reps", "q_dedup_tiered"]:
        materialize(specs[name].fn(spark, "/root/testdata/sf0.01"))
        clear_pipeline_cache()
    for sf_dir, names in [
        (".benchdata/sf1", ["q_consensus_reps", "q_dedup_tiered"]),
        (".benchdata/sf10", ["q_consensus_reps"]),
    ]:
        bench_dir = ingest_layout(spark, sf_dir)
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        for name in names:
            t0 = time.perf_counter()
            materialize(specs[name].fn(spark, bench_dir))
            cold = time.perf_counter() - t0
            clear_pipeline_cache()
            t0 = time.perf_counter()
            materialize(specs[name].fn(spark, bench_dir))
            warm = time.perf_counter() - t0
            clear_pipeline_cache()
            dk = duck_capped(con, specs[name].oracle)
            dks = f"{dk:.1f}" if dk is not None else "DNF (>250 s)"
            ratio = f"{cold / dk:.2f}x" if dk is not None else "—"
            print(f"| {name} | {os.path.basename(sf_dir)} | {cold:.1f} | {warm:.1f} | {dks} | {ratio} |")
    spark.stop()


if __name__ == "__main__":
    (run_decade if "decade" in sys.argv else run_sf01)()
