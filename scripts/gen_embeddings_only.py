#!/usr/bin/env python
"""Generate ONLY the embeddings table at a large SF (VERDICT r15 item 6:
push one adopted scaling law one decade further — sf100 means n=2M
vectors, but the full gen would also write a 600M-row lineitem that
nothing in the ANN decade row reads).

Same distribution as scripts/gen_benchdata.py's embeddings block (10
unit-norm label clusters, 0.8·center + 0.2·N(0, 1/8) noise, re-normalized,
float32), written in row-group-sized chunks so the file parallelizes
(32 row groups — the r14 monolith lesson). Seeded deterministically per
sf; NOT draw-order-identical to the full generator (a fresh decade has no
prior file to match — determinism here means this script reproduces
itself).

Usage: python scripts/gen_embeddings_only.py --sf 100 [--out .benchdata/sf100]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=100.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--row-groups", type=int, default=32)
    args = ap.parse_args()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = args.out or os.path.join(root, ".benchdata", f"sf{args.sf:g}")
    os.makedirs(out, exist_ok=True)
    n_emb = int(20_000 * args.sf)
    rng = np.random.default_rng(1_031_607 + int(args.sf))
    centers = rng.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    path = os.path.join(out, "embeddings.parquet")
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    chunk = (n_emb + args.row_groups - 1) // args.row_groups
    with pq.ParquetWriter(path, schema) as w:
        for start in range(0, n_emb, chunk):
            m = min(chunk, n_emb - start)
            labels = rng.integers(0, 10, m)
            vecs = 0.8 * centers[labels] + 0.2 * rng.normal(0, 1 / 8, (m, 64))
            vecs = (
                vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
            ).astype(np.float32)
            w.write_table(
                pa.table(
                    {
                        "vec_id": np.arange(start, start + m, dtype=np.int64),
                        "embedding": pa.FixedSizeListArray.from_arrays(
                            pa.array(vecs.ravel()), 64
                        ).cast(pa.list_(pa.float32())),
                        "label": labels.astype(np.int32),
                    },
                    schema=schema,
                )
            )
    print(f"{path}: {n_emb} rows, {args.row_groups} row groups")


if __name__ == "__main__":
    main()
