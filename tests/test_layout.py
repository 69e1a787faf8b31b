"""layout.fan_out — the r16 tiny-scan parallelizer (guide §2.5/§6).

Pins the three contract points an optimization must not drift on:
1. a provably-tiny single-file scan is repartitioned to session
   parallelism (the added exchange is the whole point);
2. the decision is metadata-driven — non-file sources and inputs over
   the byte bound are returned UNCHANGED (production scale adds zero
   exchanges);
3. values are unchanged — kmeans_fit over a fanned-out file scan equals
   kmeans_fit over the identical rows from a non-file source (which
   skips fan_out), pinning that the repartition cannot flip any
   decimal-argmin decision downstream.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_housing_spark import layout
from etl_housing_spark.layout import fan_out


def _emb(spark):
    from tests.conftest import SF_SMOKE

    return (
        spark.read.parquet(SF_SMOKE + "/embeddings.parquet")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
    )


def test_fan_out_parallelizes_tiny_file_scan(spark):
    emb = _emb(spark)
    par = spark.sparkContext.defaultParallelism
    assert len(emb.inputFiles()) < par  # the premise: an under-parallel scan
    assert fan_out(emb, "vec_id").rdd.getNumPartitions() == par


def test_fan_out_noop_for_non_file_source(spark):
    df = spark.range(10)
    assert fan_out(df) is df


def test_fan_out_noop_over_byte_bound(spark, monkeypatch):
    # simulate production scale (total bytes over the bound) without
    # writing gigabytes: drop the bound to 0 so the same tiny scan now
    # reads as "big" — fan_out must return the frame unchanged
    emb = _emb(spark)
    monkeypatch.setattr(layout, "FAN_OUT_MAX_BYTES", 0)
    assert fan_out(emb, "vec_id") is emb


def test_kmeans_fit_value_invariant_under_fan_out(spark):
    # file-scan input (fan_out fires inside kmeans_assign) vs the same
    # rows as a local non-file relation (fan_out no-ops): assignments and
    # centroids must agree exactly
    from etl_housing_spark.operators.clustering import kmeans_fit

    emb = _emb(spark)
    local = spark.createDataFrame(emb.collect(), emb.schema)
    assert not local.inputFiles()  # premise: the control skips fan_out
    a1, c1 = kmeans_fit(emb, k=7, rounds=2)
    a2, c2 = kmeans_fit(local, k=7, rounds=2)
    assert sorted(map(tuple, a1.select("vec_id", "cid").collect())) == sorted(
        map(tuple, a2.select("vec_id", "cid").collect())
    )
    assert sorted(map(tuple, c1.collect())) == sorted(map(tuple, c2.collect()))
