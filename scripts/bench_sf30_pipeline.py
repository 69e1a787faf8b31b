#!/usr/bin/env python
"""One-decade-further measurement of the dedup headline (VERDICT r07 ask #7).

Times the three multi-stage pipeline queries (q_minhash_pairs_portable,
q_dedup_pipeline_portable, q_corpus_pipeline) at an arbitrary generated SF
(default .benchdata/sf30, ~5.6 GB — past the page-cache comfort zone of the
sf10 run) under the exact bench.py protocol: ingest relayout (not billed),
engine warmup at sf0.01 (not billed), cold + warm timed passes. Also reports
the bench.py load/sanity telemetry and first skew/spill observations: the AQE
markers present in the executed plans (skew-join splits, coalesced
readers) and the session peak RSS. The DuckDB yardstick runs in its own
process (scripts/bench_sf30_duckdb.py) — at sf30 it alone takes tens of
minutes, and running the engines sequentially in separate processes keeps
either measurement from contaminating the other.

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import pathlib
import resource
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bench import _load_snapshot, ingest_layout, materialize  # noqa: E402
from etl_housing_spark.operators._ckpt import clear_pipeline_cache  # noqa: E402
from etl_housing_spark.plans import all_queries  # noqa: E402
from etl_housing_spark.session import get_session  # noqa: E402

QUERIES = (
    "q_minhash_pairs_portable",
    "q_dedup_pipeline_portable",
    "q_corpus_pipeline",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", ".benchdata/sf30")
    specs = all_queries()

    spark = get_session(app_name="ehs-bench-sf30")
    spark.sparkContext.setLogLevel("ERROR")
    bench_dir = ingest_layout(spark, sf_dir)

    # engine warmup (JIT/codegen; not billed) at the small correctness SF
    for name in QUERIES:
        materialize(specs[name].fn(spark, "/root/testdata/sf0.01"))
    clear_pipeline_cache()

    load_start = _load_snapshot()
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    plans: dict[str, dict] = {}
    for name in QUERIES:
        t0 = time.perf_counter()
        materialize(specs[name].fn(spark, bench_dir))
        cold[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        df = specs[name].fn(spark, bench_dir)
        materialize(df)
        warm[name] = round(time.perf_counter() - t0, 3)
        # first skew/spill observations: AQE runtime markers in the
        # EXECUTED plan (present only after materialization)
        executed = df._jdf.queryExecution().executedPlan().toString()
        plans[name] = {
            "aqe_skew_splits": executed.count("skewed="),
            "aqe_coalesced_reads": executed.count("coalesced"),
        }
        print(f"{name}: cold {cold[name]}s warm {warm[name]}s "
              f"{plans[name]}", file=sys.stderr)
        clear_pipeline_cache()

    peak_rss_gb = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2
    )  # driver only; the JVM child is the real consumer, see jvm_rss below
    jvm_rss_gb = None
    try:
        import subprocess

        out = subprocess.run(
            ["ps", "-o", "rss=", "--ppid", str(os.getpid())],
            capture_output=True, text=True, check=True,
        ).stdout.split()
        jvm_rss_gb = round(max(int(x) for x in out) / 1e6, 2) if out else None
    except Exception:
        pass
    spark.stop()

    print(json.dumps({
        "sf_dir": sf_dir,
        "spark_cold": cold, "spark_warm": warm,
        "spark_cold_total": round(sum(cold.values()), 3),
        "spark_warm_total": round(sum(warm.values()), 3),
        "aqe_observations": plans,
        "spark_driver_rss_gb": peak_rss_gb,
        "spark_jvm_rss_gb": jvm_rss_gb,
        "load_start": load_start, "load_end": _load_snapshot(),
    }))


if __name__ == "__main__":
    main()
