"""Local replica of the driver's DuckDB-oracle differential check.

Runs a registered query's Spark implementation and its oracle SQL on the
same parquet tables, then compares row count, column names, and values —
exactly (bit-level for floats): the engine's aggregation designs
(decimal-exact sums, identical double expression trees) are built so both
engines produce the *same* doubles, and this harness enforces it.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from etl_housing_spark.catalog import TABLES


def oracle_df(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetch_df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("bool")
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def assert_parity(spark, spec, sf_dir: str) -> None:
    sdf = _normalize(spec.fn(spark, sf_dir).toPandas())
    odf = _normalize(oracle_df(spec.oracle, sf_dir))
    assert list(sdf.columns) == list(odf.columns), (
        f"{spec.name}: columns differ spark={list(sdf.columns)} oracle={list(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{spec.name}: rowcount spark={len(sdf)} oracle={len(odf)}"
    for c in sdf.columns:
        s, o = sdf[c].to_numpy(), odf[c].to_numpy()
        # The driver's hash check is type-strict: int64 38480 vs float64
        # 38480.0 hash-mismatch there even though they compare equal here.
        # Fail locally on any post-normalization dtype drift so that class
        # of red can't ship (e.g. DuckDB HUGEINT -> float64 vs Spark int64).
        assert s.dtype == o.dtype, (
            f"{spec.name}.{c}: dtype drift spark={s.dtype} oracle={o.dtype} "
            "(driver hash check is type-strict; cast the oracle or the query)"
        )
        if np.issubdtype(s.dtype, np.floating):
            exact = np.array_equal(s, o, equal_nan=True)
            if not exact:
                with np.errstate(all="ignore"):
                    diff = np.nanmax(np.abs(s - o))
                raise AssertionError(
                    f"{spec.name}.{c}: float values differ (max abs diff {diff:.3e}); "
                    f"first rows spark={s[:3]} oracle={o[:3]}"
                )
        else:
            mism = ~(pd.Series(s).fillna("\0") == pd.Series(o).fillna("\0"))
            if mism.any():
                i = int(np.argmax(mism.to_numpy()))
                raise AssertionError(
                    f"{spec.name}.{c}: {int(mism.sum())} mismatched values; "
                    f"row {i}: spark={s[i]!r} oracle={o[i]!r}"
                )
    assert not math.isnan(len(sdf))  # keep mypy-ish linters quiet
