#!/usr/bin/env python
"""Phase-level decomposition of q_ann_index_refit's eager build wall
(r16 guide §1): times _append_artifacts (old-build + append), the union
readback/count, the staged rebuild (_build_and_write_index), the swap and
the final serve separately, labeling jobs per phase.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/r16_profile_refit.py
"""

from __future__ import annotations

import math
import os
import pathlib
import sys
import time
import uuid as _uuid

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from etl_housing_spark.operators._ckpt import clear_pipeline_cache  # noqa: E402
from etl_housing_spark.plans.vector_queries import (  # noqa: E402
    _append_artifacts,
    _build_and_write_index,
    _index_dir,
)
from etl_housing_spark.operators.quantize import ivfpq_scaled_topk  # noqa: E402
from etl_housing_spark.session import get_session  # noqa: E402
from etl_housing_spark.sources.warehouse import swap_directory  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="r16-prof-refit")
    spark.sparkContext.setLogLevel("ERROR")
    reps = int(os.environ.get("REPS", "2"))
    for rep in range(reps):
        clear_pipeline_cache()
        out = _index_dir(sf_dir) + "_refitprof"
        marks = [("start", time.perf_counter())]

        def mark(name):
            marks.append((name, time.perf_counter()))

        spark.sparkContext.setJobDescription(f"refit:append_artifacts#{rep}")
        _p_cells, _p_cb, kc_old, _np_old = _append_artifacts(
            spark, sf_dir, out, old_mod=6
        )
        mark("append_artifacts(60%+40%)")
        union = spark.read.parquet(out + "/assign_by_cell").select("vec_id", "v")
        n_total = union.count()
        mark("union_count")
        k_due = int(math.ceil(math.sqrt(n_total)))
        staging = f"{out}.staging-{_uuid.uuid4().hex[:8]}"
        spark.sparkContext.setJobDescription(f"refit:rebuild#{rep}")
        kc_new, nprobe_new = _build_and_write_index(spark, union, n_total, staging)
        mark("rebuild_build_and_write")
        swap_directory(staging, out)
        mark("swap")
        p_assign = spark.read.parquet(out + "/assign_by_cell").select(
            "vec_id", "v", "cid"
        )
        p_cells = spark.read.parquet(out + "/cells")
        p_cb = spark.read.parquet(out + "/codebooks")
        p_codes = spark.read.parquet(out + "/codes")
        qvec = list(p_assign.filter(F.col("vec_id") == 0).select("v").first()[0])
        spark.sparkContext.setJobDescription(f"refit:serve#{rep}")
        res = ivfpq_scaled_topk(
            p_assign,
            index=(p_assign, p_cells, p_cb, kc_new, nprobe_new),
            codes=p_codes,
            query_vec=qvec,
        )
        res.write.format("noop").mode("overwrite").save()
        mark("serve_action")
        spark.sparkContext.setJobDescription(None)
        prev = marks[0][1]
        for name, t in marks[1:]:
            print(f"rep{rep} {name:28s} {t - prev:7.2f}s", flush=True)
            prev = t
        print(f"rep{rep} TOTAL {marks[-1][1] - marks[0][1]:7.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
