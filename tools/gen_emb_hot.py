#!/usr/bin/env python3
"""Degenerate hot-mass embedding corpora for the semanticDedup
hot-cluster-guard scale probe (VERDICT r11 task #2) -- companion of
gen_emb_clustered.py (tooling only, NOT part of the Scala library).

75% of vectors are EXACTLY identical (one seeded unit vector repeated)
-- identical post-quantization, so k-means cannot separate them: every
seed drawn from the mass collapses to the same centroid and the argmin
ties to one cid. This is the corpus where semanticDedup's intra-cluster
prune is quadratic without the guard, and where the guard's
modulo-salting + survivor-merge path must deliver the n*cap bound.
The other 25% are iid unit gaussians (background, no near-dups at 0.8).

Two scales with identical structure:
  - embh0.1: 2000 vectors (the sf0.1 embedding count)
  - embh1:  20000 vectors (10x)
Other tables are symlinked from sf0.1 (Tables.load opens every file).
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUTROOT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/bench"
RATE = 0.75
SEED = 2042


def gen(n, out):
    rng = np.random.RandomState(SEED)
    hot = rng.randn(64)
    hot /= np.linalg.norm(hot)
    E = rng.randn(n, 64).astype(np.float64)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    n_hot = int(n * RATE)
    # Hot ids scattered across the id space (every 4th-ish id pattern
    # would alias with the guard's modulo salting -- use a seeded
    # permutation instead so chunk sizes stay ~uniform by accident of
    # ids, as in a real corpus).
    hot_ids = np.sort(rng.choice(n, size=n_hot, replace=False))
    E[hot_ids] = hot
    os.makedirs(out, exist_ok=True)
    emb = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([e for e in E.astype(np.float32)],
                              type=pa.list_(pa.float32())),
        "label": pa.array(rng.randint(0, 10, size=n).astype(np.int32)),
    })
    pq.write_table(emb, f"{out}/embeddings.parquet")
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents"]:
        dst = f"{out}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{name}.parquet", dst)
    print(f"{out}: n={n} hot={n_hot} (identical) background={n - n_hot}")


if len(sys.argv) > 2:
    # One explicit corpus, as gen_emb_clustered.py:
    #   python3 tools/gen_emb_hot.py bench 600000 embh30
    n = int(sys.argv[2])
    name = sys.argv[3] if len(sys.argv) > 3 else f"embh{n // 20000}"
    gen(n, f"{OUTROOT}/{name}")
else:
    gen(2000, f"{OUTROOT}/embh0.1")
    gen(20000, f"{OUTROOT}/embh1")
