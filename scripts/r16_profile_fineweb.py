#!/usr/bin/env python
"""Stage-level decomposition of q_fineweb_funnel (guide §1.1): time each
feature sub-frame through the noop sink, cold (pipeline cache drained) and
warm, to find where the 3-4 s isolated wall lives.
"""

from __future__ import annotations

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_housing_spark.operators._ckpt import clear_pipeline_cache  # noqa: E402
from etl_housing_spark.plans import all_queries  # noqa: E402
from etl_housing_spark.session import get_session  # noqa: E402
from etl_housing_spark.catalog import load_table  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="r16-prof-fineweb")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_housing_spark.plans.dedup_queries import q_minhash_portable
    from etl_housing_spark.plans.pipeline_queries import _unigram_ce
    from etl_housing_spark.plans.text_queries import gopher_metrics

    docs = load_table(spark, sf_dir, "documents")

    def piece(name, mk):
        for rep in range(2):
            if rep == 0:
                clear_pipeline_cache()
            spark.sparkContext.setJobDescription(f"{name}#{rep}")
            t0 = time.perf_counter()
            noop(mk())
            print(f"{name} rep{rep}: {time.perf_counter() - t0:6.2f}s", flush=True)
        clear_pipeline_cache()

    piece("gopher_metrics", lambda: gopher_metrics(docs))
    t = docs.select("doc_id", F.split("text", " ").alias("w"))
    bg = t.filter(F.size("w") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 2), i -> concat_ws(' ', w[i], w[i+1]))"
            )
        ).alias("bigram"),
    )
    piece(
        "bigram_maxcount",
        lambda: bg.groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("mc")),
    )
    piece("unigram_ce", lambda: _unigram_ce(docs).select("doc_id", "ce6"))
    piece("md5_fp", lambda: docs.select("doc_id", F.md5("text").alias("f")))
    piece("minhash_sigs", lambda: q_minhash_portable(spark, sf_dir))
    piece("full_funnel", lambda: all_queries()["q_fineweb_funnel"].fn(spark, sf_dir))
    spark.stop()


if __name__ == "__main__":
    main()
