#!/usr/bin/env python
"""Stage-level decomposition of q_semdedup's cold wall (r16 guide §1).

Materializes each sub-stage of the semdedup chain through the noop sink in
sequence: kmeans fit/assign, the within-cluster pair join WITHOUT the
cosine filter (candidate volume), and the full filtered pair relation —
so the expensive stage is identified before any rewrite.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/r16_profile_semdedup.py
"""

from __future__ import annotations

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from etl_housing_spark.functions import vectors as V  # noqa: E402
from etl_housing_spark.operators._ckpt import clear_pipeline_cache  # noqa: E402
from etl_housing_spark.operators.clustering import kmeans_fit  # noqa: E402
from etl_housing_spark.session import get_session  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="r16-prof-semdedup")
    spark.sparkContext.setLogLevel("ERROR")
    reps = int(os.environ.get("REPS", "2"))

    for rep in range(reps):
        clear_pipeline_cache()
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
            "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
        )

        def stage(name, df):
            spark.sparkContext.setJobDescription(f"semdedup:{name}#{rep}")
            t0 = time.perf_counter()
            noop(df)
            dt = time.perf_counter() - t0
            print(f"rep{rep} {name:28s} {dt:7.2f}s", flush=True)
            spark.sparkContext.setJobDescription(None)

        t_all = time.perf_counter()
        assigned, _c = kmeans_fit(emb, k=4, rounds=2)
        stage("kmeans_fit+assign", assigned)

        a = assigned.select("cid", F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
        b = assigned.select("cid", F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
        cand = a.join(b, "cid").filter(F.col("id_b") < F.col("id_a"))
        stage("pairs_no_cosine(count)", cand.select("id_a", "id_b"))

        cos = V.dot(F.col("va"), F.col("vb")) / (
            V.norm(F.col("va")) * V.norm(F.col("vb"))
        )
        full = cand.filter(cos >= F.lit(0.5)).select("id_a", "id_b")
        stage("pairs_with_cosine", full)
        print(f"rep{rep} TOTAL {time.perf_counter() - t_all:7.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
