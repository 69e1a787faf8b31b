#!/usr/bin/env python
"""Round-13 per-query ratio + decade measurements (BASELINE.md protocol).

Measures the round's new/changed queries — q_ivfpq_search (now at the
sweep-proven default (M=16, nprobe=4, rerank=50)), q_semdedup_scaled
(corpus-scaled k), q_ewma_portable, q_jdbc_roundtrip — at sf0.1
(floor/marginal/DuckDB), then decade points:

- decade: q_ivfpq_search + q_semdedup_scaled at sf1/sf10 (VERDICT r13
  items 2 and 3 — the tuned-ANN scan-fraction claim and the scaled-k
  linearity claim both need points past fixture scale), with the IVFPQ
  probed-cell scan fraction measured in-engine per scale.
- sf30: q_consensus_reps + q_dedup_tiered one decade past their 2.1x/2.2x
  sf10 points (VERDICT r13 item 6 — codec tax amortizing through the bar,
  or a plateau worth root-causing).

DuckDB legs run with a 250 s interrupt cap (DNF is itself data).

Usage: python scripts/bench_r13_ratios.py [sf0.1|decade|sf30]
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

NEW = [
    n.strip()
    for n in os.environ.get(
        "R13_QUERIES",
        "q_ivfpq_search,q_semdedup_scaled,q_ewma_portable,q_jdbc_roundtrip",
    ).split(",")
    if n.strip()
]
CAP_S = 250.0


def duck_capped(con, sql: str) -> float | None:
    """Oracle wall-clock, or None on DNF (interrupted at CAP_S). Cursor-
    scoped so a stale interrupt can't poison the shared connection."""
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


def _views(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def run_sf01() -> None:
    specs = all_queries()
    spark = get_session(app_name="ehs-r13-ratios")
    spark.sparkContext.setLogLevel("ERROR")
    floor_dir = "/root/testdata/sf0.001"
    bench_dir = ingest_layout(spark, "/root/testdata/sf0.1")
    con = _views("/root/testdata/sf0.1")
    for name in NEW:
        materialize(specs[name].fn(spark, floor_dir))
        materialize(specs[name].fn(spark, bench_dir))
        if specs[name].oracle:
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
        dk = duck_capped(con, specs[name].oracle) if specs[name].oracle else None
        mg = max(0.0, sp - fl)
        if dk is None:
            print(f"| {name} | {sp:.3f} | {fl:.3f} | {mg:.3f} | DNF/none | — | — |")
        else:
            print(
                f"| {name} | {sp:.3f} | {fl:.3f} | {mg:.3f} | {dk:.3f} "
                f"| {sp / dk:.1f}x | {mg / dk:.1f}x |"
            )
    spark.stop()


def _ivfpq_scan_fraction(spark, sf_dir: str) -> float:
    """Probed-cell corpus fraction under the shipped default — computed
    from the exact probe the search uses (same _ivfpq_parts)."""
    from pyspark.sql import functions as F

    from etl_housing_spark.catalog import load_table
    from etl_housing_spark.operators.quantize import _ivfpq_parts

    emb = load_table(spark, sf_dir, "embeddings")
    parts = _ivfpq_parts(emb, 0, 4, 16, 64, "vec_id", "embedding", "label")
    probe = parts[3]
    n_probed = emb.join(F.broadcast(probe), "label").count()
    n_total = emb.count()
    return n_probed / n_total


def run_decade() -> None:
    specs = all_queries()
    spark = get_session(app_name="ehs-r13-decade")
    spark.sparkContext.setLogLevel("ERROR")
    for name in ["q_ivfpq_search", "q_semdedup_scaled"]:
        materialize(specs[name].fn(spark, "/root/testdata/sf0.01"))
        clear_pipeline_cache()
    for sf_dir, names in [
        (".benchdata/sf1", ["q_ivfpq_search", "q_semdedup_scaled"]),
        (".benchdata/sf10", ["q_ivfpq_search", "q_semdedup_scaled"]),
    ]:
        bench_dir = ingest_layout(spark, sf_dir)
        con = _views(sf_dir)
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
            extra = ""
            if name == "q_ivfpq_search":
                extra = f" scan_frac={_ivfpq_scan_fraction(spark, bench_dir):.3f}"
                clear_pipeline_cache()
            print(
                f"| {name} | {os.path.basename(sf_dir)} | {cold:.1f} | {warm:.1f} "
                f"| {dks} | {ratio} |{extra}"
            )
    spark.stop()


def run_sf30() -> None:
    specs = all_queries()
    spark = get_session(app_name="ehs-r13-sf30")
    spark.sparkContext.setLogLevel("ERROR")
    for name in ["q_consensus_reps", "q_dedup_tiered"]:
        materialize(specs[name].fn(spark, "/root/testdata/sf0.01"))
        clear_pipeline_cache()
    sf_dir = ".benchdata/sf30"
    bench_dir = ingest_layout(spark, sf_dir)
    con = _views(sf_dir)
    for name in ["q_consensus_reps", "q_dedup_tiered"]:
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
        print(f"| {name} | sf30 | {cold:.1f} | {warm:.1f} | {dks} | {ratio} |")
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "sf0.1"
    {"sf0.1": run_sf01, "decade": run_decade, "sf30": run_sf30}[mode]()
