#!/usr/bin/env python
"""Round-15 measurements (BASELINE.md protocol): the SERVED ANN path.

Subcommands:
  serve     per-query serving wall at $R15_SF_DIR (default .benchdata/sf10)
            against the PERSISTED 4-artifact index (assignment + codes both
            partitionBy(cid) — the q_ann_index_serve layout): IVFFlat float
            scan (partition-pruned) vs IVFPQ stateless (per-query code
            re-assignment, the r14 2.5-3.9 s shape) vs IVFPQ packed-persisted
            (partition-pruned codes + pruned rerank — the r15 path), several
            query ids each, cold (first) + warm (repeat). VERDICT r14 item 1:
            target = close the 2.5-3.9 s vs 0.44-1.0 s gap at parity-or-better
            while keeping the bytes win.
  sweep     recall@10 + scan fraction + wall at nprobe in {1x, 1.5x, 2x, 3x}
            of the default ceil(sqrt(kc)) and rerank in {100, 200}, from ONE
            built index per sf (sf1 + sf10), truth = float brute-force L2
            top-10 per query id (VERDICT r14 item 4: what does nprobe buy
            back the last two neighbors, at what scan cost).
  sf0.1     floor/marginal/DuckDB protocol row for q_ann_index_serve.

DuckDB legs run with a 250 s interrupt cap (DNF is itself data).
"""

from __future__ import annotations

import math
import os
import pathlib
import sys
import threading
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from bench import ingest_layout, materialize
from etl_housing_spark.catalog import load_table
from etl_housing_spark.operators._ckpt import clear_pipeline_cache
from etl_housing_spark.plans import all_queries
from etl_housing_spark.session import get_session

CAP_S = 250.0
DIM, M, KPQ = 64, 16, 256
QIDS = [0, 17, 4242]


def _vecs(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )


def _persisted_index(spark, sf_dir):
    """Build the scaled index + packed codes ONCE and write the
    q_ann_index_serve artifact layout (assignment and codes both
    partitionBy(cid)); return the read-back frames. The build cost is the
    amortized ingest pass — serving measurements below never touch the
    source corpus or the in-memory lineage."""
    from etl_housing_spark.operators._ckpt import tracked_persist
    from etl_housing_spark.operators.quantize import (
        ivfpq_scaled_codes,
        ivfpq_scaled_index,
        pq_residual_codebooks,
    )
    from etl_housing_spark.plans.vector_queries import _index_dir

    vecs = _vecs(spark, sf_dir)
    n = vecs.count()
    t0 = time.perf_counter()
    assigned, cents, cb, kc, nprobe = ivfpq_scaled_index(vecs, n=n)
    assigned = tracked_persist(assigned)
    cents = tracked_persist(cents)
    cb = tracked_persist(pq_residual_codebooks(assigned, cents, n))
    codes = ivfpq_scaled_codes((assigned, cents, cb, kc, nprobe))
    out = _index_dir(sf_dir)
    assigned.repartition("cid").write.mode("overwrite").partitionBy(
        "cid"
    ).parquet(out + "/assign_by_cell")
    cents.write.mode("overwrite").parquet(out + "/cells")
    cb.write.mode("overwrite").parquet(out + "/codebooks")
    codes.repartition("cid").write.mode("overwrite").partitionBy(
        "cid"
    ).parquet(out + "/codes")
    build_s = time.perf_counter() - t0
    clear_pipeline_cache()
    p_assign = spark.read.parquet(out + "/assign_by_cell").select(
        "vec_id", "v", "cid"
    )
    p_cells = spark.read.parquet(out + "/cells")
    p_cb = spark.read.parquet(out + "/codebooks")
    p_codes = spark.read.parquet(out + "/codes")
    print(
        f"  index build+write n={n} kc={kc} nprobe={nprobe}: {build_s:.1f}s "
        f"(amortized ingest pass)"
    )
    return p_assign, p_cells, p_cb, p_codes, kc, nprobe, n


def _qvecs(spark, sf_dir, qids):
    """Query vectors as VALUES (the deployment shape: a user query is not
    a corpus row) — fetched once from the compact source table, outside
    any timed region."""
    rows = (
        _vecs(spark, sf_dir)
        .filter(F.col("vec_id").isin(list(qids)))
        .collect()
    )
    return {r.vec_id: list(r.v) for r in rows}


def _lit_q(qvec):
    return F.array(*[F.lit(float(x)) for x in qvec])


def _probe_cids(p_cells, qvec, nprobe):
    from etl_housing_spark.functions import vectors as V

    probe = (
        p_cells.select(
            "cid", V.sqdist(F.col("c"), _lit_q(qvec)).alias("d")
        )
        .orderBy("d", "cid")
        .limit(nprobe)
        .select("cid")
    )
    return [r.cid for r in probe.collect()]


def _ivfflat_pruned(p_assign, p_cells, qvec, nprobe, k=10):
    """Served IVFFlat: probe cids collected, float scan partition-pruned,
    query vector a literal, scoring a static codegen expression."""
    from etl_housing_spark.functions import vectors as V

    cids = _probe_cids(p_cells, qvec, nprobe)
    return (
        p_assign.filter(F.col("cid").isin(cids))
        .select(
            "vec_id",
            F.round(V.sqdist(F.col("v"), _lit_q(qvec)), 6).alias("d2"),
        )
        .orderBy("d2", "vec_id")
        .limit(k)
    )


def run_serve() -> None:
    from etl_housing_spark.operators.quantize import ivfpq_scaled_topk

    sf_dir = os.environ.get("R15_SF_DIR", "/root/repo/.benchdata/sf10")
    tag = os.path.basename(sf_dir)
    spark = get_session(app_name="ehs-r15-serve")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = ingest_layout(spark, sf_dir)
    p_assign, p_cells, p_cb, p_codes, kc, nprobe, n = _persisted_index(
        spark, sf_dir
    )
    idx = (p_assign, p_cells, p_cb, kc, nprobe)
    qvecs = _qvecs(spark, sf_dir, QIDS)
    paths = {
        "IVFFlat(pruned floats)": lambda qid: _ivfflat_pruned(
            p_assign, p_cells, qvecs[qid], nprobe
        ),
        "IVFPQ(stateless reassign)": lambda qid: ivfpq_scaled_topk(
            p_assign, query_id=qid, index=idx, query_vec=qvecs[qid]
        ),
        "IVFPQ(packed persisted)": lambda qid: ivfpq_scaled_topk(
            p_assign, query_id=qid, index=idx, codes=p_codes,
            query_vec=qvecs[qid],
        ),
    }
    for name, fn in paths.items():
        walls = []
        for rep in range(2):  # cold then warm
            for qid in QIDS:
                t0 = time.perf_counter()
                materialize(fn(qid))
                walls.append(time.perf_counter() - t0)
        cold = walls[: len(QIDS)]
        warm = walls[len(QIDS):]
        print(
            f"  {tag} {name}: cold "
            + "/".join(f"{w * 1000:.0f}" for w in cold)
            + " ms | warm "
            + "/".join(f"{w * 1000:.0f}" for w in warm)
            + f" ms (median warm {sorted(warm)[len(warm) // 2] * 1000:.0f} ms)"
        )
    # bytes per query (the storage story, from actual probed counts)
    cids = _probe_cids(p_cells, qvecs[QIDS[0]], nprobe)
    n_probed = p_assign.filter(F.col("cid").isin(cids)).count()
    flat_b = n_probed * DIM * 4
    pq_b = n_probed * M + 100 * DIM * 4 + KPQ * DIM * 8 + kc * DIM * 8
    print(
        f"  {tag}: probed {n_probed}/{n} ({100.0 * n_probed / n:.2f}%) | "
        f"IVFFlat {flat_b / 1e6:.2f} MB | IVFPQ {pq_b / 1e6:.3f} MB | "
        f"ratio {flat_b / pq_b:.1f}x"
    )
    spark.stop()


def _truth_top10(p_assign, qvec):
    """Float brute-force L2 top-10 (ties broken by id) — the sweep truth.
    Float, not decimal: recall only needs the SET of the true neighbors,
    and the corpus has no coincident distances at these scales."""
    lq = _lit_q(qvec)
    d2 = None
    for i in range(DIM):
        t = (F.col("v").getItem(i) - lq.getItem(i)) * (
            F.col("v").getItem(i) - lq.getItem(i)
        )
        d2 = t if d2 is None else d2 + t
    rows = (
        p_assign.select("vec_id", d2.alias("d2"))
        .orderBy("d2", "vec_id")
        .limit(10)
        .collect()
    )
    return {r.vec_id for r in rows}


def run_sweep() -> None:
    from etl_housing_spark.operators.quantize import ivfpq_scaled_topk

    sfs = os.environ.get(
        "R15_SWEEP_SFS", "/root/repo/.benchdata/sf1,/root/repo/.benchdata/sf10"
    ).split(",")
    spark = get_session(app_name="ehs-r15-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sfs:
        tag = os.path.basename(sf_dir)
        sf_dir = ingest_layout(spark, sf_dir)
        p_assign, p_cells, p_cb, p_codes, kc, np0, n = _persisted_index(
            spark, sf_dir
        )
        qvecs = _qvecs(spark, sf_dir, QIDS)
        truths = {qid: _truth_top10(p_assign, qvecs[qid]) for qid in QIDS}
        for mult in (1.0, 1.5, 2.0, 3.0):
            nprobe = min(kc, int(math.ceil(np0 * mult)))
            idx = (p_assign, p_cells, p_cb, kc, nprobe)
            scan_frac = None
            for rerank in (100, 200):
                hits, wall = 0, 0.0
                for qid in QIDS:
                    t0 = time.perf_counter()
                    got = {
                        r.vec_id
                        for r in ivfpq_scaled_topk(
                            p_assign, query_id=qid, index=idx,
                            codes=p_codes, rerank=rerank,
                            query_vec=qvecs[qid],
                        ).collect()
                    }
                    wall += time.perf_counter() - t0
                    hits += len(got & truths[qid])
                if scan_frac is None:
                    cids = _probe_cids(p_cells, qvecs[QIDS[0]], nprobe)
                    n_probed = p_assign.filter(F.col("cid").isin(cids)).count()
                    scan_frac = 100.0 * n_probed / n
                print(
                    f"  {tag} nprobe={nprobe} ({mult:.1f}x) rerank={rerank}: "
                    f"recall@10={hits / (10.0 * len(QIDS)):.3f} "
                    f"({hits}/{10 * len(QIDS)}), scan {scan_frac:.2f}%, "
                    f"wall {wall / len(QIDS):.2f} s/query"
                )
        clear_pipeline_cache()
    spark.stop()


def run_media_recall() -> None:
    """VERDICT r14 item 6: image per-bin band-layout recall AT SF10 via a
    SAMPLED truth. The registered harness (q_image_band_recall) died at
    sf10 because its truth side grows ~n² on the repeated-image fixture —
    instrument cost, not detector cost. This instrument bounds it two ways:
    (1) truth membership is capped per 8-bit-band bucket by deterministic
    md5 order (the repo's standard sampling), so pair formation is
    <= CAP² per bucket instead of m²; (2) detection is evaluated
    ROW-LOCALLY on the carried hash halves (a pair is detected by a
    layout iff ANY of its bands is equal — the same pigeonhole algebra the
    candidate join buckets on), so there is no candidate-side join at
    all. Sampling is independent of the hash structure, so per-bin recall
    on the sampled pairs estimates the full-truth recall; the pigeonhole
    bins (d<=1 for 2x32, d<=3 for 4x16) must still be EXACTLY 1.0 on any
    sample — that part is n-free."""
    from pyspark.sql.window import Window

    from etl_housing_spark.operators._ckpt import tracked_persist
    from etl_housing_spark.operators.multimodal import phash_media, resize_media
    from etl_housing_spark.plans.text_queries import (
        _phash_band_exprs,
        _phash_bands_spark,
        _phash_hamming,
        _png_fixture_media,
    )

    cap = int(os.environ.get("R15_TRUTH_CAP", "24"))
    spark = get_session(app_name="ehs-r15-media-recall")
    spark.sparkContext.setLogLevel("ERROR")
    sfs = [
        s
        for s in os.environ.get(
            "R15_MEDIA_SFS",
            "/root/repo/.benchdata/sf1,/root/repo/.benchdata/sf10",
        ).split(",")
        if s
    ]

    def _detected(width: int):
        exprs = _phash_band_exprs(width, "shiftright({h}, {s})")
        eqs = [
            "("
            + e.replace("phash_lo", "la").replace("phash_hi", "ha")
            + " = "
            + e.replace("phash_lo", "lb").replace("phash_hi", "hb")
            + ")"
            for e in exprs
        ]
        return F.expr(" OR ".join(eqs)).cast("int")

    for sf_dir in sfs:
        tag = os.path.basename(sf_dir)
        sf_dir = ingest_layout(spark, sf_dir)
        t0 = time.perf_counter()
        docs = load_table(spark, sf_dir, "documents").select("doc_id")
        ph = tracked_persist(
            phash_media(
                resize_media(_png_fixture_media(docs), 9, 8, strict=True),
                strict=True,
            ).select("media_id", "phash_hi", "phash_lo")
        )
        bands = ph.selectExpr(
            "media_id", "phash_hi", "phash_lo", _phash_bands_spark(8)
        )
        w = Window.partitionBy("bd", "bval").orderBy(
            F.md5(F.concat_ws(":", F.lit("truthcap"), F.col("media_id"))),
            "media_id",
        )
        samp = (
            bands.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= cap)
            .drop("rn")
        )
        a = samp.select(
            F.col("media_id").alias("id_a"), F.col("phash_hi").alias("ha"),
            F.col("phash_lo").alias("la"), "bd", "bval",
        )
        b = samp.select(
            F.col("media_id").alias("id_b"), F.col("phash_hi").alias("hb"),
            F.col("phash_lo").alias("lb"), "bd", "bval",
        )
        truth = (
            a.join(b, ["bd", "bval"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "ha", "la", "hb", "lb")
            .distinct()
            .withColumn("d", _phash_hamming().cast("bigint"))
            .filter(F.col("d") <= 6)
        )
        rows = (
            truth.select(
                "d",
                _detected(32).alias("d32"),
                _detected(16).alias("d16"),
            )
            .groupBy("d")
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.sum("d32").alias("det32"),
                F.sum("d16").alias("det16"),
            )
            .orderBy("d")
            .collect()
        )
        wall = time.perf_counter() - t0
        for r in rows:
            print(
                f"  {tag} d={r.d}: sampled-truth={r.n_pairs} | "
                f"b2x32 recall={r.det32 / r.n_pairs:.4f} | "
                f"b4x16 recall={r.det16 / r.n_pairs:.4f}"
            )
        print(f"  {tag} sampled-truth harness wall {wall:.1f}s (cap={cap})")
        ph.unpersist()
        clear_pipeline_cache()
    spark.stop()


def run_sf01() -> None:
    import duckdb

    names = [
        n.strip()
        for n in os.environ.get(
            "R15_QUERIES", "q_ann_index_serve,q_ann_serve_batch"
        ).split(",")
        if n.strip()
    ]
    specs = all_queries()
    spark = get_session(app_name="ehs-r15-sf01")
    spark.sparkContext.setLogLevel("ERROR")
    bench_dir = ingest_layout(spark, "/root/testdata/sf0.1")
    for name in names:
        for rep in ("cold", "warm"):
            t0 = time.perf_counter()
            materialize(specs[name].fn(spark, bench_dir))
            print(f"  {name} sf0.1 {rep}: {time.perf_counter() - t0:.2f}s")
            clear_pipeline_cache()
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'/root/testdata/sf0.1/{t}.parquet'"
        )
    for name in names:
        done = threading.Event()
        cur = con.cursor()

        def _watch():
            if not done.wait(CAP_S) and not done.is_set():
                cur.interrupt()

        w = threading.Thread(target=_watch, daemon=True)
        w.start()
        t0 = time.perf_counter()
        try:
            cur.execute(specs[name].oracle).fetchall()
            print(
                f"  duckdb {name} sf0.1: {time.perf_counter() - t0:.2f}s"
            )
        except Exception as e:  # noqa: BLE001
            print(
                f"  duckdb {name} sf0.1: DNF ({type(e).__name__}) at {CAP_S}s"
            )
        done.set()
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "serve"
    {
        "serve": run_serve,
        "sweep": run_sweep,
        "sf0.1": run_sf01,
        "media_recall": run_media_recall,
    }[cmd]()
