#!/usr/bin/env python
"""Round-14 measurements (BASELINE.md protocol): the compressed scaled ANN.

Subcommands:
  sf0.1     floor/marginal/DuckDB protocol rows for the round's new queries
            (q_ivfpq_scaled, q_ivfpq_recall_scaled, q_ann_index_persist,
            q_ann_index_incremental).
  decade    q_ivfpq_recall_scaled recall + wall at sf1/sf10 (exact mode,
            VERDICT r14 done-criterion: recall >= 0.8 at both), with the
            probed-cell scan fraction and BYTES SCANNED for the IVFFlat
            vs IVFPQ variants computed from the same built index.
  amortized per-query latency + bytes against a BUILT-ONCE index at
            $R14_SF_DIR (default .benchdata/sf10): IVFFlat float scan vs
            IVFPQ codes+rerank, several query ids each, plus the
            per-batch incremental-assign cost (VERDICT items 2 & 5).
  sf30      fast-mode recall + scan stats one decade further.

DuckDB legs run with a 250 s interrupt cap (DNF is itself data).
"""

from __future__ import annotations

import math
import os
import pathlib
import sys
import threading
import time

import duckdb

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bench import ingest_layout, materialize
from etl_housing_spark.catalog import TABLES, load_table
from etl_housing_spark.operators._ckpt import clear_pipeline_cache
from etl_housing_spark.plans import all_queries
from etl_housing_spark.session import get_session

NEW = [
    n.strip()
    for n in os.environ.get(
        "R14_QUERIES",
        "q_ivfpq_scaled,q_ivfpq_recall_scaled,q_ann_index_persist,"
        "q_ann_index_incremental",
    ).split(",")
    if n.strip()
]
CAP_S = 250.0
DIM, M, KPQ, RERANK = 64, 16, 256, 100


def duck_capped(con, sql: str) -> float | None:
    cur = con.cursor()
    done = threading.Event()

    def _watch():
        if not done.wait(CAP_S) and not done.is_set():
            cur.interrupt()

    threading.Thread(target=_watch, daemon=True).start()
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
    spark = get_session(app_name="ehs-r14-ratios")
    spark.sparkContext.setLogLevel("ERROR")
    floor_dir = "/root/testdata/sf0.001"
    bench_dir = ingest_layout(spark, "/root/testdata/sf0.1")
    con = _views("/root/testdata/sf0.1")
    for name in NEW:  # warmup pass
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


def _vecs(spark, sf_dir):
    from pyspark.sql import functions as F

    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )


def _built_index(spark, sf_dir):
    """Build + cache the scaled index once; returns (vecs, idx, codes, n)."""
    from etl_housing_spark.operators.quantize import (
        ivfpq_scaled_codes,
        ivfpq_scaled_index,
    )

    vecs = _vecs(spark, sf_dir).cache()
    n = vecs.count()
    t0 = time.perf_counter()
    assigned, cents, cb, kc, nprobe = ivfpq_scaled_index(vecs, n=n)
    assigned = assigned.cache()
    assigned.count()
    cents = cents.cache()
    cents.count()
    cb = cb.cache()
    cb.count()
    build_s = time.perf_counter() - t0
    idx = (assigned, cents, cb, kc, nprobe)
    t0 = time.perf_counter()
    codes = ivfpq_scaled_codes(idx).cache()
    codes.count()
    codes_s = time.perf_counter() - t0
    print(
        f"  index build n={n} kc={kc} nprobe={nprobe}: fit+codebooks "
        f"{build_s:.1f}s, full code table {codes_s:.1f}s"
    )
    return vecs, idx, codes, n


def _probe_count(vecs, idx, qid) -> int:
    from pyspark.sql import functions as F

    from etl_housing_spark.functions import vectors as V

    assigned, cents, _cb, _kc, nprobe = idx
    qv = vecs.filter(F.col("vec_id") == qid).select(F.col("v").alias("__q"))
    probe = (
        cents.crossJoin(F.broadcast(qv))
        .select("cid", V.sqdist(F.col("c"), F.col("__q")).alias("d"))
        .orderBy("d", "cid")
        .limit(nprobe)
        .select("cid")
    )
    return assigned.join(F.broadcast(probe), "cid").count()


def _ivfflat_query(vecs, idx, qid):
    """Served IVFFlat search (q_ann_ivf_scaled's shape vs a built index)."""
    from pyspark.sql import functions as F

    from etl_housing_spark.functions import vectors as V

    assigned, cents, _cb, kc, nprobe = idx
    qv = vecs.filter(F.col("vec_id") == qid).select(F.col("v").alias("__q"))
    probe = (
        cents.crossJoin(F.broadcast(qv))
        .select("cid", V.dot_seq(F.col("c"), F.col("__q")).alias("cs"))
        .orderBy(F.desc("cs"), "cid")
        .limit(nprobe)
        .select("cid")
    )
    pruned = assigned.join(F.broadcast(probe), "cid")
    return (
        pruned.crossJoin(F.broadcast(qv))
        .select("vec_id", F.round(V.dot_seq(F.col("v"), F.col("__q")), 6).alias("score"))
        .orderBy(F.desc("score"), "vec_id")
        .limit(10)
    )


def _scan_report(sf_tag, n, idx, n_probed):
    kc, nprobe = idx[3], idx[4]
    flat_b = n_probed * DIM * 4
    pq_b = n_probed * M + RERANK * DIM * 4 + KPQ * DIM * 8 + kc * DIM * 8
    print(
        f"  {sf_tag}: n={n} kc={kc} nprobe={nprobe} probed={n_probed} "
        f"({100.0 * n_probed / n:.1f}%) | IVFFlat scan {flat_b / 1e6:.2f} MB "
        f"| IVFPQ scan {pq_b / 1e6:.3f} MB (codes {n_probed * M / 1e6:.3f} "
        f"+ rerank {RERANK * DIM * 4 / 1e6:.3f} + tables) "
        f"| ratio {flat_b / pq_b:.1f}x"
    )


def run_decade(sfs=("/root/repo/.benchdata/sf1", "/root/repo/.benchdata/sf10")) -> None:
    specs = all_queries()
    spark = get_session(app_name="ehs-r14-decade")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sfs:
        tag = os.path.basename(sf_dir)
        sf_dir = ingest_layout(spark, sf_dir)  # multi-row-group layout:
        # the raw benchdata parquet is ONE row group, which collapses
        # every corpus-wide stage to a single task (measured: the sf10
        # exact fit ran one core for 1h+ before this line)
        t0 = time.perf_counter()
        row = specs["q_ivfpq_recall_scaled"].fn(spark, sf_dir).collect()[0]
        wall = time.perf_counter() - t0
        clear_pipeline_cache()
        print(f"{tag}: recall_at_10={row.recall_at_k} ({row.n_hits}/10), {wall:.1f}s")
        vecs, idx, codes, n = _built_index(spark, sf_dir)
        n_probed = _probe_count(vecs, idx, 0)
        _scan_report(tag, n, idx, n_probed)
        for df in (vecs, idx[0], idx[1], idx[2], codes):
            df.unpersist()
        clear_pipeline_cache()
    spark.stop()


def run_amortized() -> None:
    from etl_housing_spark.operators.quantize import ivfpq_scaled_topk

    sf_dir = os.environ.get("R14_SF_DIR", "/root/repo/.benchdata/sf10")
    tag = os.path.basename(sf_dir)
    spark = get_session(app_name="ehs-r14-amortized")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = ingest_layout(spark, sf_dir)
    vecs, idx, codes, n = _built_index(spark, sf_dir)
    qids = [0, 17, 4242]
    for qid in qids:
        t0 = time.perf_counter()
        materialize(_ivfflat_query(vecs, idx, qid))
        flat_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        materialize(ivfpq_scaled_topk(vecs, query_id=qid, index=idx, codes=codes))
        pq_s = time.perf_counter() - t0
        n_probed = _probe_count(vecs, idx, qid)
        print(
            f"  {tag} qid={qid}: IVFFlat {flat_s * 1000:.0f} ms | "
            f"IVFPQ(codes) {pq_s * 1000:.0f} ms | probed {n_probed} "
            f"({100.0 * n_probed / n:.2f}%)"
        )
        _scan_report(tag, n, idx, n_probed)
    # incremental per-batch cost: assign the deterministic 20% batch to
    # the already-built cells (centroids cached in idx[1])
    from pyspark.sql import functions as F

    from etl_housing_spark.operators.clustering import kmeans_assign

    batch = vecs.filter(F.col("vec_id") % 10 >= 8)
    nb = batch.count()
    t0 = time.perf_counter()
    materialize(kmeans_assign(batch, idx[1]))
    inc_s = time.perf_counter() - t0
    print(f"  {tag} incremental assign: {nb} rows x {idx[3]} cells in {inc_s:.1f}s")
    spark.stop()


def run_sf30() -> None:
    specs = all_queries()
    spark = get_session(app_name="ehs-r14-sf30")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = ingest_layout(spark, "/root/repo/.benchdata/sf30")
    t0 = time.perf_counter()
    row = specs["q_ivfpq_recall_scaled"].fn(spark, sf_dir).collect()[0]
    wall = time.perf_counter() - t0
    clear_pipeline_cache()
    print(f"sf30: recall_at_10={row.recall_at_k} ({row.n_hits}/10), {wall:.1f}s")
    vecs, idx, codes, n = _built_index(spark, sf_dir)
    n_probed = _probe_count(vecs, idx, 0)
    _scan_report("sf30", n, idx, n_probed)
    spark.stop()




def run_media_recall() -> None:
    """VERDICT r13 item 6: quality decade points for the media near-dup
    detectors. Image: the registered per-bin recall harness at sf1/sf10
    (pigeonhole bins must hold 1.0). Audio/video: recall is structurally
    1.0 at ANY scale (their oracles ARE the unbanded fp+gate form — the
    banding is candidate pruning with a subsumption proof), so the decade
    quantity that can move is PRECISION: bucket population and
    candidates-per-verified-pair are measured per scale instead."""
    from pyspark.sql import functions as F

    specs = all_queries()
    spark = get_session(app_name="ehs-r14-media-recall")
    spark.sparkContext.setLogLevel("ERROR")
    sfs = [s for s in os.environ.get(
        "R14_MEDIA_SFS", "/root/repo/.benchdata/sf1,/root/repo/.benchdata/sf10"
    ).split(",") if s]
    for sf_dir in sfs:
        tag = os.path.basename(sf_dir)
        sf_dir = ingest_layout(spark, sf_dir)
        t0 = time.perf_counter()
        rows = specs["q_image_band_recall"].fn(spark, sf_dir).collect()
        wall = time.perf_counter() - t0
        clear_pipeline_cache()
        for r in sorted(rows, key=lambda r: (r.layout, r.d_bin)):
            print(
                f"  {tag} image {r.layout} d<={r.d_bin}: truth={r.n_pairs} "
                f"cand={r.n_candidates} detected={r.n_detected} "
                f"recall={r.recall}"
            )
        print(f"  {tag} image harness wall {wall:.1f}s")
        for name in ("q_audio_neardup", "q_video_neardup"):
            t0 = time.perf_counter()
            pairs = specs[name].fn(spark, sf_dir)
            n_pairs = pairs.count()
            wall = time.perf_counter() - t0
            clear_pipeline_cache()
            print(f"  {tag} {name}: verified pairs={n_pairs} wall={wall:.1f}s")
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "sf0.1"
    {"sf0.1": run_sf01, "decade": run_decade, "amortized": run_amortized,
     "sf30": run_sf30, "media_recall": run_media_recall}[mode]()
