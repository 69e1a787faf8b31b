#!/usr/bin/env python
"""Lifecycle-at-scale instrument (round 15, part 3): the maintenance path
measured STAGE BY STAGE at decade scale.

The registered queries (q_ann_index_append / q_ann_index_compact) run the
whole lifecycle in one call because the driver contract is stateless; the
deployment question is the MARGINAL cost of each maintenance stage against
an index that already exists:

  build   — fit + codebooks + 4 artifact writes on the OLD 80% (amortized)
  append  — frozen-assign + frozen-encode the 20% growth batch + the two
            partitioned append writes (the recurring ingest cost)
  serve/2 — per-query serving wall with TWO files per touched cell
            (what appends leave behind)
  compact — partition-preserving rewrite of both artifacts (one shuffle
            keyed on cid over artifact bytes)
  serve/1 — per-query serving wall back at ONE file per cell

Usage: R15_SF_DIR=/root/repo/.benchdata/sf10 python scripts/bench_r15b_lifecycle.py
"""

from __future__ import annotations

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from bench import ingest_layout  # noqa: E402
from etl_housing_spark.catalog import load_table  # noqa: E402
from etl_housing_spark.operators._ckpt import tracked_persist  # noqa: E402
from etl_housing_spark.operators.clustering import kmeans_assign  # noqa: E402
from etl_housing_spark.operators.quantize import (  # noqa: E402
    ivfpq_scaled_codes,
    ivfpq_scaled_index,
    ivfpq_scaled_topk,
    pq_residual_codebooks,
)
from etl_housing_spark.session import get_session  # noqa: E402
from etl_housing_spark.sources.warehouse import (  # noqa: E402
    compact_partitioned_table,
)

QIDS = [0, 17, 29]


def _files_per_cell(path: str) -> tuple[int, float]:
    """(cell dirs, mean parquet files per cell dir)."""
    dirs = [d for d in os.listdir(path) if d.startswith("cid=")]
    counts = [
        len([f for f in os.listdir(f"{path}/{d}") if f.endswith(".parquet")])
        for d in dirs
    ]
    return len(dirs), sum(counts) / max(1, len(counts))


def main() -> None:
    sf_dir = os.environ.get("R15_SF_DIR", "/root/repo/.benchdata/sf10")
    tag = os.path.basename(sf_dir)
    spark = get_session(app_name="ehs-r15b-lifecycle")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = ingest_layout(spark, sf_dir)
    out = f"/tmp/ehs_r15b_{tag}"

    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    old = vecs.filter(F.col("vec_id") % 10 < 8)
    batch = vecs.filter(F.col("vec_id") % 10 >= 8)
    n_old = old.count()

    t0 = time.perf_counter()
    assigned, cents, cb, kc, nprobe = ivfpq_scaled_index(old, n=n_old)
    assigned = tracked_persist(assigned)
    cents = tracked_persist(cents)
    cb = tracked_persist(pq_residual_codebooks(assigned, cents, n_old))
    codes_old = ivfpq_scaled_codes((assigned, cents, cb, kc, nprobe))
    assigned.repartition("cid").write.mode("overwrite").partitionBy(
        "cid"
    ).parquet(out + "/assign_by_cell")
    cents.write.mode("overwrite").parquet(out + "/cells")
    cb.write.mode("overwrite").parquet(out + "/codebooks")
    codes_old.repartition("cid").write.mode("overwrite").partitionBy(
        "cid"
    ).parquet(out + "/codes")
    t_build = time.perf_counter() - t0
    print(f"{tag}: build(80%) n_old={n_old} kc={kc} nprobe={nprobe}: "
          f"{t_build:.1f}s")

    p_cells = spark.read.parquet(out + "/cells")
    p_cb = spark.read.parquet(out + "/codebooks")

    t0 = time.perf_counter()
    ba = tracked_persist(kmeans_assign(batch, p_cells))
    codes_new = ivfpq_scaled_codes((ba, p_cells, p_cb, kc, nprobe))
    ba.select("vec_id", "v", "cid").repartition("cid").write.mode(
        "append"
    ).partitionBy("cid").parquet(out + "/assign_by_cell")
    codes_new.repartition("cid").write.mode("append").partitionBy(
        "cid"
    ).parquet(out + "/codes")
    n_batch = ba.count()
    t_append = time.perf_counter() - t0
    print(f"{tag}: append(20%) n_batch={n_batch}: {t_append:.1f}s "
          f"({1000.0 * t_append / n_batch:.2f} ms/kvec x1000)")

    def serve_round(label: str) -> None:
        p_assign = spark.read.parquet(out + "/assign_by_cell").select(
            "vec_id", "v", "cid"
        )
        p_codes = spark.read.parquet(out + "/codes")
        qvecs = {
            r["vec_id"]: list(r["v"])
            for r in p_assign.filter(F.col("vec_id").isin(QIDS)).collect()
        }
        walls = []
        for rep in range(2):
            for qid in QIDS:
                t0 = time.perf_counter()
                ivfpq_scaled_topk(
                    p_assign,
                    index=(p_assign, p_cells, p_cb, kc, nprobe),
                    codes=p_codes,
                    query_vec=qvecs[qid],
                ).collect()
                walls.append(time.perf_counter() - t0)
        warm = walls[len(QIDS):]
        cells_a, fpc_a = _files_per_cell(out + "/assign_by_cell")
        cells_c, fpc_c = _files_per_cell(out + "/codes")
        print(
            f"{tag}: serve {label}: warm "
            + "/".join(f"{w * 1000:.0f}" for w in warm)
            + f" ms (median {sorted(warm)[len(warm) // 2] * 1000:.0f} ms) | "
            f"files/cell assign={fpc_a:.2f} codes={fpc_c:.2f} "
            f"({cells_a} cells)"
        )

    serve_round("post-append (accreted files)")

    t0 = time.perf_counter()
    compact_partitioned_table(spark, out + "/assign_by_cell", "cid")
    compact_partitioned_table(spark, out + "/codes", "cid")
    t_compact = time.perf_counter() - t0
    print(f"{tag}: compact both artifacts: {t_compact:.1f}s")

    serve_round("post-compact (1 file/cell)")
    spark.stop()


if __name__ == "__main__":
    main()
