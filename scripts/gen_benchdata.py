#!/usr/bin/env python
"""Generate larger-SF bench data with the same schemas/distributions as
/root/testdata (TESTDATA.md tables).

The driver ships sf0.001/0.01/0.1 only; BASELINE.md's scale argument ("the
fixed per-query floor amortizes away; marginal cost is the number that
predicts 100 TB") needs at least one decade more data to be substantiated
rather than asserted. This script replicates the observed generator
recipe — schema-identical, seed-deterministic, distribution-matched (verified
against sf0.1: zero-truncated Poisson(4) lineitem fan-out, uniform key
domains, equifrequent categorical vocabularies, 30-day µs-timestamp event
window, the 31-token document vocabulary, per-label Gaussian embeddings) —
at any scale factor. It is NOT the driver's exact byte stream (that recipe
is not shipped); it is the same population, which is what throughput
benchmarking needs. Correctness runs stay on the driver's own parquet.

Usage:
    python scripts/gen_benchdata.py [--sf 1.0] [--out .benchdata/sf1]

Writes one parquet per table. sf1 ≈ 6M lineitem rows, ~1.1 GB on disk;
generation is chunked so peak memory stays bounded.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = 42  # TESTDATA.md seed

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = 25
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
STATUSES = ["F", "O", "P"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
RETFLAGS = ["A", "N", "R"]
LINESTATUS = ["F", "O"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = (["en"] * 8 + ["de", "es", "fr", "zh"] * 3)[:20]  # ~40% en, rest even
BRANDS = [f"Brand#{i}{j}" for i in range(1, 6) for j in range(1, 6)]
PTYPES = [
    f"{a} {b} {c}"
    for a in ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
    for b in ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
    for c in ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
]
# the sf0.1 documents vocabulary (31 tokens, observed verbatim)
VOCAB = (
    "a agg batch big column customer data dup fast filter group hash join key "
    "line merge order part query row scan slow small sort spark stream table "
    "the value vector window"
).split()
assert len(VOCAB) == 31


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def gen(sf: float, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    rng = np.random.default_rng(BASE)

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(NATIONS), pa.int32()),
        "n_name": [f"NATION_{i:02d}" for i in range(NATIONS)],
        "n_regionkey": pa.array([i % 5 for i in range(NATIONS)], pa.int32()),
    }))
    _write(out, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, NATIONS, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    _write(out, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, NATIONS, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))
    _write(out, "part", pa.table({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [f"part {i}" for i in range(n_part)],
        "p_brand": pa.array(np.array(BRANDS)[rng.integers(0, len(BRANDS), n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, len(PTYPES), n_part)]),
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(rng.uniform(900, 2000, n_part), 2),
    }))

    day_us = 86_400_000_000
    t0 = np.datetime64("1995-01-01", "us").astype(np.int64)
    odate = t0 + rng.integers(0, 2404, n_ord) * day_us  # 1995-01 .. 2001-08
    _write(out, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": pa.array(np.array(STATUSES)[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": odate.view("datetime64[us]"),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    # lineitem: zero-truncated Poisson(4) lines per order (verified vs sf0.1)
    fan = rng.poisson(4.0, n_ord)
    fan = np.where(fan == 0, 1, fan)
    l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), fan)
    n_li = len(l_orderkey)
    linenumber = (np.arange(n_li) - np.repeat(np.cumsum(fan) - fan, fan) + 1).astype(np.int32)
    ship = np.repeat(odate, fan) + rng.integers(1, 95, n_li) * day_us
    _write(out, "lineitem", pa.table({
        "l_orderkey": l_orderkey,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": linenumber,
        "l_quantity": np.floor(rng.uniform(1, 51, n_li)),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(RETFLAGS)[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(LINESTATUS)[rng.integers(0, 2, n_li)]),
        "l_shipdate": ship.view("datetime64[us]"),
    }))

    e0 = np.datetime64("2024-01-01", "us").astype(np.int64)
    ets = e0 + rng.integers(0, 30 * day_us, n_ev)
    _write(out, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": np.sort(ets).view("datetime64[us]"),
        "user_id": rng.integers(0, int(15_000 * sf), n_ev),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(np.clip(rng.exponential(75, n_ev), 0, 600), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: 15-60 tokens from the 31-token vocabulary; ~0.2% exact dups
    lens = rng.integers(15, 61, n_doc)
    vocab = np.array(VOCAB)
    texts = [" ".join(vocab[rng.integers(0, 31, ln)]) for ln in lens]
    dup_idx = rng.integers(0, n_doc, max(2, n_doc // 500))
    for i in dup_idx[1:]:
        texts[i] = texts[dup_idx[0]]
    _write(out, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.integers(0, len(LANGS), n_doc)]),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n_doc)]),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    # embeddings: 64-dim float32, 10 label clusters (center + noise), ~unit norm
    centers = rng.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = 0.8 * centers[labels] + 0.2 * rng.normal(0, 1 / 8, (n_emb, 64))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    _write(out, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.FixedSizeListArray.from_arrays(pa.array(vecs.ravel()), 64).cast(
            pa.list_(pa.float32())
        ),
        "label": labels.astype(np.int32),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = args.out or os.path.join(root, ".benchdata", f"sf{args.sf:g}")
    print(f"generating sf={args.sf} -> {out}")
    gen(args.sf, out)


if __name__ == "__main__":
    main()
