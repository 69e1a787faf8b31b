#!/usr/bin/env python
"""Stage-level decomposition of q_ann_index_append's eager build (r17,
VERDICT r16 ask #3): replicates _append_artifacts + _serve_appended with a
timer around every eager boundary."""
from __future__ import annotations

import os, pathlib, sys, time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import pyspark.sql.functions as F  # noqa: E402

from etl_housing_spark.catalog import load_table  # noqa: E402
from etl_housing_spark.operators._ckpt import clear_pipeline_cache, tracked_persist  # noqa: E402
from etl_housing_spark.operators.clustering import kmeans_assign  # noqa: E402
from etl_housing_spark.operators.quantize import (  # noqa: E402
    ivfpq_scaled_codes, ivfpq_scaled_index, ivfpq_scaled_topk, pq_residual_codebooks,
)
from etl_housing_spark.plans.vector_queries import _index_dir  # noqa: E402
from etl_housing_spark.session import get_session  # noqa: E402

def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="r17-profile-append")
    spark.sparkContext.setLogLevel("ERROR")
    out = _index_dir(sf_dir) + "_profile_append"
    for rep in range(int(os.environ.get("REPS", "2"))):
        clear_pipeline_cache()
        t = [time.perf_counter()]
        def mark(label):
            t.append(time.perf_counter())
            print(f"  {label:28s} {t[-1]-t[-2]:6.2f}s", flush=True)
        vecs = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        old = vecs.filter(F.col("vec_id") % 10 < 8)
        batch = vecs.filter(F.col("vec_id") % 10 >= 8)
        n_old = old.count(); mark("count(old)")
        assigned, cents, cb, kc, nprobe = ivfpq_scaled_index(old, n=n_old)
        assigned = tracked_persist(assigned); cents = tracked_persist(cents)
        cb = tracked_persist(pq_residual_codebooks(assigned, cents, n_old))
        codes_old = ivfpq_scaled_codes((assigned, cents, cb, kc, nprobe))
        mark("plan-build (lazy)")
        assigned.repartition("cid").write.mode("overwrite").partitionBy("cid").parquet(out + "/assign_by_cell")
        mark("write assign_by_cell")
        cents.write.mode("overwrite").parquet(out + "/cells"); mark("write cells")
        cb.write.mode("overwrite").parquet(out + "/codebooks"); mark("write codebooks")
        codes_old.repartition("cid").write.mode("overwrite").partitionBy("cid").parquet(out + "/codes")
        mark("write codes")
        p_cells = spark.read.parquet(out + "/cells")
        p_cb = spark.read.parquet(out + "/codebooks")
        ba = tracked_persist(kmeans_assign(batch, p_cells))
        codes_new = ivfpq_scaled_codes((ba, p_cells, p_cb, kc, nprobe))
        ba.select("vec_id", "v", "cid").repartition("cid").write.mode("append").partitionBy("cid").parquet(out + "/assign_by_cell")
        mark("append assign (batch)")
        codes_new.repartition("cid").write.mode("append").partitionBy("cid").parquet(out + "/codes")
        mark("append codes (batch)")
        p_assign = spark.read.parquet(out + "/assign_by_cell").select("vec_id", "v", "cid")
        p_codes = spark.read.parquet(out + "/codes")
        qvec = list(p_assign.filter(F.col("vec_id") == 0).select("v").first()[0])
        mark("qvec first()")
        res = ivfpq_scaled_topk(p_assign, index=(p_assign, p_cells, p_cb, kc, nprobe),
                                codes=p_codes, query_vec=qvec)
        res.withColumn("appended", (F.col("vec_id") % 10 >= 8).cast("int")).write.format("noop").mode("overwrite").save()
        mark("serve action")
        print(f"rep{rep}: total {t[-1]-t[0]:.2f}s", flush=True)
    spark.stop()

if __name__ == "__main__":
    main()
