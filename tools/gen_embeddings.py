#!/usr/bin/env python3
"""Generate an embeddings-ONLY ladder rung for the ANN recall gate.

The full gen_sf1.py ladder carries 20k vectors per sf0.1 multiple, so the
two-level IVF trigger (~2.1M vectors, where listsFor crosses the one-task
MaxLists=1024 clamp) sits at an impractical MULT≈105 for the full table
set. This writes JUST embeddings.parquet — the only table sim_knn_cosine /
sim_ann_lsh / sim_ann_ivf read — with the same 64-dim N(0, 0.15) float32
distribution and schema as every other rung, chunked so memory stays flat.
Deterministic (fixed numpy seed, no clock). Verification infrastructure
like tools/compare.py — NOT part of the engine.

Usage: python3 tools/gen_embeddings.py [/tmp/emb4m] [N_VECS]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/emb4m"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4_200_000
CHUNK = 250_000
rng = np.random.default_rng(42)

os.makedirs(OUT, exist_ok=True)
schema = pa.schema([
    ("vec_id", pa.int64()),
    ("embedding", pa.list_(pa.float32())),
    ("label", pa.int32()),
])
with pq.ParquetWriter(f"{OUT}/embeddings.parquet", schema) as w:
    for lo in range(0, N, CHUNK):
        hi = min(lo + CHUNK, N)
        emb = rng.normal(0, 0.15, (hi - lo, 64)).astype(np.float32)
        flat = pa.array(emb.reshape(-1), pa.float32())
        offsets = pa.array(np.arange(0, (hi - lo) * 64 + 1, 64, dtype=np.int32))
        w.write_table(pa.table({
            "vec_id": pa.array(range(lo, hi), pa.int64()),
            "embedding": pa.ListArray.from_arrays(offsets, flat),
            "label": pa.array(rng.integers(0, 10, hi - lo), pa.int32()),
        }, schema=schema))
        print(f"[gen-emb] {hi}/{N}")
print(f"[gen-emb] done -> {OUT}")
