#!/usr/bin/env python
"""Stage-level decomposition of q_ivfpq_scaled's cold wall (r16 guide §1).

Mirrors ivfpq_scaled_topk's stateless branch, materializing each persisted
build stage through the noop sink in sequence so the per-stage cost is
visible (the registered query runs them nested inside one action). Labels
every job so a UI/event-log reading matches the printed table.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/r16_profile_ivfpq.py
"""

from __future__ import annotations

import math
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from etl_housing_spark.operators._ckpt import clear_pipeline_cache, tracked_persist  # noqa: E402
from etl_housing_spark.operators.clustering import (  # noqa: E402
    kmeans_assign,
    kmeans_update,
    seed_centroids,
)
from etl_housing_spark.operators.quantize import (  # noqa: E402
    _assign_codes_subs,
    _codebook_subs,
    _residual_subs,
    pq_residual_codebooks,
)
from etl_housing_spark.session import get_session  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="r16-prof-ivfpq")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    reps = int(os.environ.get("REPS", "2"))
    for rep in range(reps):
        clear_pipeline_cache()
        stages: list[tuple[str, float]] = []

        def timed(tag, fn):
            spark.sparkContext.setJobDescription(tag)
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            stages.append((tag, dt))
            spark.sparkContext.setJobDescription(None)
            return out

        n = timed("count", emb.count)
        kc = int(math.ceil(math.sqrt(n)))
        nprobe = int(math.ceil(2 * math.sqrt(kc)))
        cents0 = seed_centroids(emb, kc)
        a1 = kmeans_assign(emb, cents0)
        timed("assign1", lambda: noop(a1))
        c1 = kmeans_update(a1)
        a2 = tracked_persist(kmeans_assign(emb, c1))
        timed("update1+assign2", lambda: noop(a2))
        cents = tracked_persist(kmeans_update(a2))
        timed("update2", lambda: noop(cents))
        cb = tracked_persist(pq_residual_codebooks(a2, cents, n))
        timed("codebooks", lambda: noop(cb))

        # query side (query_id=0, lookup form like the registered query)
        qv = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("__q"))
        qd = emb.filter(F.col("vec_id") == 0).select(
            F.posexplode(F.col("v")).alias("i", "qx")
        )
        from etl_housing_spark.functions import vectors as V

        probe = (
            cents.crossJoin(F.broadcast(qv))
            .select("cid", V.sqdist(F.col("c"), F.col("__q")).alias("d"))
            .orderBy("d", "cid")
            .limit(nprobe)
            .select("cid")
        )
        qres = (
            cents.select("cid", F.posexplode("c").alias("i", "cx"))
            .join(F.broadcast(probe), "cid")
            .join(F.broadcast(qd), "i")
            .select(
                "cid", "i", F.expr("i div 4").alias("sub"),
                (F.col("qx") - F.col("cx")).alias("qr"),
            )
        )
        from etl_housing_spark.operators.quantize import _sq_dist_term

        lut = tracked_persist(
            qres.join(F.broadcast(cb), "i")
            .groupBy("cid", "sub", "cand")
            .agg(
                F.sum(_sq_dist_term(F.col("qr"), F.col("c")))
                .cast("double")
                .alias("lut_d2")
            )
        )
        timed("probe+lut", lambda: noop(lut))
        rsub = _residual_subs(a2.join(F.broadcast(probe), "cid"), cents, 16, 4)
        pcodes = tracked_persist(_assign_codes_subs(rsub, _codebook_subs(cb, 4)))
        timed("codes_assign(probed)", lambda: noop(pcodes))
        adc = (
            pcodes.join(
                F.broadcast(lut),
                (pcodes.cid == lut.cid)
                & (pcodes.sub == lut.sub)
                & (pcodes.code == lut.cand),
            )
            .groupBy("vec_id")
            .agg(
                F.sum(F.col("lut_d2").cast("decimal(38,18)"))
                .cast("double")
                .alias("adc_d2")
            )
        )
        rerank = max(100, 2 * kc)
        cand = adc.orderBy("adc_d2", "vec_id").limit(rerank).select("vec_id")
        ex = (
            emb.join(F.broadcast(cand), "vec_id")
            .select("vec_id", F.posexplode(F.col("v")).alias("i", "x"))
            .join(F.broadcast(qd.select("i", F.col("qx"))), "i")
            .groupBy("vec_id")
            .agg(
                F.sum(_sq_dist_term(F.col("x"), F.col("qx")))
                .cast("double")
                .alias("exact_d2")
            )
        )
        final = ex.orderBy("exact_d2", "vec_id").limit(10)
        timed("adc+rerank+topk", lambda: noop(final))

        total = sum(dt for _t, dt in stages)
        print(f"--- rep {rep} (n={n}, kc={kc}, nprobe={nprobe}, R={rerank}) "
              f"total {total:.2f}s")
        for tag, dt in stages:
            print(f"  {tag:24s} {dt:7.2f}s  ({100 * dt / total:4.1f}%)")
    clear_pipeline_cache()
    spark.stop()


if __name__ == "__main__":
    main()
