#!/usr/bin/env python
"""Prototype: RESIDUAL IVFADC (codes on x - cell_centroid, per-cell LUT)
vs the shipped non-residual form — ADC top-R recall of the true L2 top-10.
Fast-mode, Spark-only; decides whether the oracle rewrite pays.

Usage: python scripts/r14_ann_resid_proto.py [sf_dir] [rerank] [extra_round]
"""
from __future__ import annotations

import math
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from etl_housing_spark.functions import vectors as V
from etl_housing_spark.operators.quantize import _sq_dist_term
from etl_housing_spark.operators.clustering import kmeans_fit
from etl_housing_spark.session import get_session

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.benchdata/sf1"
rerank = int(sys.argv[2]) if len(sys.argv) > 2 else 50
extra_round = int(sys.argv[3]) if len(sys.argv) > 3 else 0

spark = get_session(app_name="ehs-r14-resid")
spark.sparkContext.setLogLevel("ERROR")
from bench import ingest_layout
from etl_housing_spark.catalog import load_table

sf_dir = ingest_layout(spark, sf_dir)
vecs = load_table(spark, sf_dir, "embeddings").select(
    "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
).cache()
n = vecs.count()
kc = int(math.ceil(math.sqrt(n)))
nprobe = int(math.ceil(math.sqrt(kc)))
KPQ, M, PER = 256, 16, 4
t0 = time.perf_counter()
assigned, cents = kmeans_fit(vecs, k=kc)
assigned = assigned.cache(); assigned.count()
cents = cents.cache(); cents.count()
print(f"n={n} kc={kc} nprobe={nprobe} rerank={rerank} extra_round={extra_round} "
      f"fit {time.perf_counter()-t0:.1f}s", flush=True)

cx = cents.select("cid", F.posexplode("c").alias("i", "cx"))
# residuals of every assigned vector
rex = (
    assigned.select("vec_id", "cid", F.posexplode("v").alias("i", "x"))
    .join(cx, ["cid", "i"])
    .select("vec_id", "cid", "i", (F.col("x") - F.col("cx")).alias("x"))
    .withColumn("sub", F.expr("i div 4"))
)
hv = F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10).cast("long")
samp_ids = vecs.filter(hv <= F.lit((2048 * 4294967296 - 1) // n)).select("vec_id")
sexpl = rex.join(F.broadcast(samp_ids), "vec_id").cache()
seeds = (
    vecs.orderBy("vec_id").limit(KPQ)
    .select("vec_id").withColumn("cand", F.row_number().over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy("vec_id")) - 1)
)
seed_cb = (
    rex.join(F.broadcast(seeds), "vec_id")
    .select("cand", "i", F.col("x").alias("c"))
)
cb = seed_cb
for _ in range(1 + extra_round):
    d2 = (
        sexpl.join(F.broadcast(cb), "i")
        .groupBy("vec_id", "sub", "cand")
        .agg(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).alias("d2"))
    )
    a = (
        d2.groupBy("vec_id", "sub").agg(F.min(F.struct("d2", "cand")).alias("b"))
        .select("vec_id", "sub", F.col("b.cand").alias("cand"))
    )
    cb = (
        sexpl.join(a, ["vec_id", "sub"])
        .groupBy("cand", "i")
        .agg(F.avg("x").alias("c"))
    ).cache()
    cb.count()

qv = vecs.filter(F.col("vec_id") == 0).select(F.col("v").alias("__q"))
truth = (
    vecs.crossJoin(F.broadcast(qv))
    .select("vec_id", V.sqdist(F.col("v"), F.col("__q")).alias("d2"))
    .orderBy("d2", "vec_id").limit(10).select("vec_id").cache()
)
truth.count()
probe = (
    cents.crossJoin(F.broadcast(qv))
    .select("cid", V.sqdist(F.col("c"), F.col("__q")).alias("d"))
    .orderBy("d", "cid").limit(nprobe).select("cid").cache()
)
probe.count()
# codes for probed cells (residual)
prex = rex.join(F.broadcast(probe), "cid")
cd2 = (
    prex.join(F.broadcast(cb), "i")
    .groupBy("vec_id", "cid", "sub", "cand")
    .agg(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).alias("d2"))
)
codes = (
    cd2.groupBy("vec_id", "cid", "sub").agg(F.min(F.struct("d2", "cand")).alias("b"))
    .select("vec_id", "cid", "sub", F.col("b.cand").alias("code"))
)
# per-cell LUT: (q - c_cell) residual vs codebook entries
qd = vecs.filter(F.col("vec_id") == 0).select(F.posexplode("v").alias("i", "qx"))
qres = (
    cx.join(F.broadcast(probe), "cid")
    .join(F.broadcast(qd), "i")
    .select("cid", "i", (F.col("qx") - F.col("cx")).alias("qr"))
    .withColumn("sub", F.expr("i div 4"))
)
lut = (
    qres.join(F.broadcast(cb), "i")
    .groupBy("cid", "sub", "cand")
    .agg(F.sum((F.col("qr") - F.col("c")) * (F.col("qr") - F.col("c"))).alias("lut_d2"))
)
adc = (
    codes.join(F.broadcast(lut),
               (codes.cid == lut.cid) & (codes.sub == lut.sub) & (codes.code == lut.cand))
    .groupBy(codes.vec_id)
    .agg(F.sum("lut_d2").alias("adc_d2"))
)
cand = adc.orderBy("adc_d2", "vec_id").limit(rerank).select("vec_id")
hits = truth.join(cand, "vec_id", "semi").count()
n_probed = assigned.join(F.broadcast(probe), "cid").count()
print(f"RESIDUAL ADC top-{rerank} recall: {hits}/10 (probed {n_probed})", flush=True)
spark.stop()
