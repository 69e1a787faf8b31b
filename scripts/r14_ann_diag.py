#!/usr/bin/env python
"""Decompose q_ivfpq_scaled recall loss at a given sf: of the true L2
top-10, how many are (a) in probed cells (cell recall — the nprobe
limiter), (b) in the ADC top-rerank (the rerank limiter), (c) returned.
Run under EHS_FAST_SUMS=1 for iteration; the discrete outcomes it
diagnoses are the same decisions exact mode makes up to near-ties.

Usage: python scripts/r14_ann_diag.py [sf_dir] [rerank] [nprobe_mult]
"""
from __future__ import annotations

import math
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from etl_housing_spark.functions import vectors as V
from etl_housing_spark.operators.quantize import (
    _pq_assign,
    _sq_dist_term,
    ivfpq_scaled_index,
)
from etl_housing_spark.session import get_session

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.benchdata/sf1"
rerank = int(sys.argv[2]) if len(sys.argv) > 2 else 50
nprobe_mult = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0

spark = get_session(app_name="ehs-r14-anndiag")
spark.sparkContext.setLogLevel("ERROR")
from bench import ingest_layout
from etl_housing_spark.catalog import load_table

sf_dir = ingest_layout(spark, sf_dir)

vecs = load_table(spark, sf_dir, "embeddings").select(
    "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
).cache()
n = vecs.count()
t0 = time.perf_counter()
assigned, cents, cb, kc, nprobe = ivfpq_scaled_index(vecs, n=n)
nprobe = int(math.ceil(nprobe * nprobe_mult))
assigned = assigned.cache(); assigned.count()
cb = cb.cache(); cb.count()
print(f"{sf_dir}: n={n} kc={kc} nprobe={nprobe} rerank={rerank} "
      f"build {time.perf_counter()-t0:.1f}s", flush=True)

qv = vecs.filter(F.col("vec_id") == 0).select(F.col("v").alias("__q"))
# exact L2 top-10 ground truth
truth = (
    vecs.crossJoin(F.broadcast(qv))
    .select("vec_id", V.sqdist(F.col("v"), F.col("__q")).alias("d2"))
    .orderBy("d2", "vec_id").limit(10).select("vec_id").cache()
)
truth.count()
probe = (
    cents.crossJoin(F.broadcast(qv))
    .select("cid", V.sqdist(F.col("c"), F.col("__q")).alias("d"))
    .orderBy("d", "cid").limit(nprobe).select("cid")
)
in_cells = assigned.join(F.broadcast(probe), "cid").select("vec_id")
cell_hits = truth.join(in_cells, "vec_id", "semi").count()
print(f"cell recall: {cell_hits}/10", flush=True)

pruned = assigned.join(F.broadcast(probe), "cid").select("vec_id", "v")
codes = _pq_assign(pruned, 16, 64, "vec_id", "v", "x", codebooks=cb).select(
    "vec_id", "sub", F.col("b.cand").alias("code"))
qdims = (vecs.filter(F.col("vec_id") == 0)
         .select(F.posexplode(F.col("v")).alias("i", "qx"))
         .withColumn("sub", F.expr("i div 4")))
lut = (qdims.join(F.broadcast(cb), "i").groupBy("sub", "cand")
       .agg(F.sum(_sq_dist_term(F.col("qx").cast("double"), F.col("c")))
            .cast("double").alias("lut_d2")))
adc = (codes.join(F.broadcast(lut),
                  (codes.sub == lut.sub) & (codes.code == lut.cand))
       .groupBy("vec_id")
       .agg(F.sum(F.col("lut_d2").cast("decimal(38,18)")).cast("double")
            .alias("adc_d2")))
cand = adc.orderBy("adc_d2", "vec_id").limit(rerank).select("vec_id")
adc_hits = truth.join(cand, "vec_id", "semi").count()
print(f"ADC top-{rerank} recall: {adc_hits}/10", flush=True)
spark.stop()
