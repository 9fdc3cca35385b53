#!/usr/bin/env python3
"""Clustered near-dup embedding corpora for the round-10 scale probe
(VERDICT r9 task #1) -- the companion of gen_sf1.py (tooling only, NOT
part of the Scala library).

gen_sf1.py's embeddings are iid unit-norm gaussians, which makes q59's
cos>=0.35 threshold sit INSIDE the 64-dim random-cosine bulk: true pairs
are quadratic in n by construction, so the r9 probe could not measure the
realistic regime. Real near-dup corpora are the opposite shape: a
REAL threshold (>=0.8) sits ~6.4 sigma above the random bulk
(cos ~ N(0, 1/64) for iid unit vectors), background pairs are ~zero, and
true pairs are the planted duplicates -- linear in n at a fixed dup rate.

This generator builds that shape at two scales with identical structure:
  - embc0.1: 2000 vectors (the sf0.1 embedding count)
  - embc1:  20000 vectors (10x)
5% of vectors are mutated copies of an earlier vector: v' =
normalize(v + sigma*g) with sigma swept so cos(v, v') is uniform in
[0.82, 0.97]; ~20% of sources are copied twice (sibling pairs land near
cos^2 of the parent similarity, i.e. mostly BELOW 0.8 -- the verify step,
not the blocking, decides them). Expected pairs at cos>=0.8: ~rate*n
(linear), background ~1e-10 per pair (negligible at both scales).

Other tables are symlinked from sf0.1 (Tables.load eagerly opens every
file; the probe only reads embeddings).
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUTROOT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/bench"
RATE = 0.05
SEED = 1042


def gen(n, out):
    rng = np.random.RandomState(SEED)
    E = rng.randn(n, 64).astype(np.float64)
    E /= np.linalg.norm(E, axis=1, keepdims=True)

    n_planted = int(n * RATE)
    # Targets live in the back half so every copy points at an untouched
    # earlier vector; ~20% of sources are reused once (3-vector clusters).
    targets = rng.choice(np.arange(n // 2, n), size=n_planted, replace=False)
    n_reused = n_planted // 5
    sources = np.concatenate([
        srcs := rng.choice(n // 2, size=n_planted - n_reused, replace=False),
        rng.choice(srcs, size=n_reused, replace=False)])
    want_cos = rng.uniform(0.82, 0.97, size=n_planted)
    for t, s, c in zip(targets, sources, want_cos):
        # cos ~= 1/sqrt(1 + 64*sigma^2) for unit v + sigma*g; solve for c.
        sigma = np.sqrt((1.0 / (c * c) - 1.0) / 64.0)
        v = E[s] + sigma * rng.randn(64)
        E[t] = v / np.linalg.norm(v)

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

    # Ground truth planted-pair count at 0.8 from the float32 vectors
    # (what Spark reads), exact brute force at the small scale only.
    E32 = E.astype(np.float32).astype(np.float64)
    E32 /= np.linalg.norm(E32, axis=1, keepdims=True)
    if n <= 4000:
        true_pairs = int((np.triu(E32 @ E32.T, 1) >= 0.8).sum())
    else:
        # Every pair at >=0.8 involves a planted target (background ~0 and
        # sources are untouched originals), so scanning target rows only is
        # exact; dedup the (target, target) pairs seen from both ends.
        cos = E32[targets] @ E32.T
        cos[np.arange(n_planted), targets] = 0.0  # self
        pairs = set()
        for r, c in zip(*np.where(cos >= 0.8)):
            a, b = int(targets[r]), int(c)
            pairs.add((min(a, b), max(a, b)))
        true_pairs = len(pairs)
    print(f"{out}: n={n} planted={n_planted} "
          f"(reused sources={n_reused}) true_pairs@0.8={true_pairs}")


def gen_big(n, out, chunk=2_000_000):
    """Chunked variant for n >= ~10M (the r16 embc1000 = 20M corpus):
    gen() holds the whole float64 matrix plus a python-object embedding
    column and brute-forces planted ground truth -- fine to 2M, hopeless
    at 20M. Same structure per chunk (5% planted copies at cos uniform
    in [0.82, 0.97], 20% source reuse, copies from the chunk's first
    half -- the recall probe measures retrieval geometry, not
    cross-chunk placement), vectorized mutation, flat-buffer arrow
    lists, streamed row groups. No brute-force ground-truth print: the
    probe computes exact top-k itself.
    """
    rng = np.random.RandomState(SEED)
    os.makedirs(out, exist_ok=True)
    writer = None
    planted = 0
    for lo in range(0, n, chunk):
        m = min(chunk, n - lo)
        E = rng.randn(m, 64)
        E /= np.linalg.norm(E, axis=1, keepdims=True)
        n_pl = int(m * RATE)
        targets = rng.choice(np.arange(m // 2, m), size=n_pl, replace=False)
        n_reused = n_pl // 5
        srcs = rng.choice(m // 2, size=n_pl - n_reused, replace=False)
        sources = np.concatenate(
            [srcs, rng.choice(srcs, size=n_reused, replace=False)])
        want = rng.uniform(0.82, 0.97, size=n_pl)
        sigma = np.sqrt((1.0 / (want * want) - 1.0) / 64.0)
        V = E[sources] + sigma[:, None] * rng.randn(n_pl, 64)
        E[targets] = V / np.linalg.norm(V, axis=1, keepdims=True)
        planted += n_pl
        flat = pa.array(E.astype(np.float32).ravel(), type=pa.float32())
        offsets = pa.array(np.arange(0, (m + 1) * 64, 64, dtype=np.int32))
        tbl = pa.table({
            "vec_id": pa.array(np.arange(lo, lo + m, dtype=np.int64)),
            "embedding": pa.ListArray.from_arrays(offsets, flat),
            "label": pa.array(rng.randint(0, 10, size=m).astype(np.int32)),
        })
        if writer is None:
            writer = pq.ParquetWriter(f"{out}/embeddings.parquet", tbl.schema)
        writer.write_table(tbl)
    writer.close()
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents"]:
        dst = f"{out}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{name}.parquet", dst)
    print(f"{out}: n={n} planted={planted} (chunked, no brute-force check)")


if len(sys.argv) > 2:
    # One explicit corpus: n and (derived) directory name — how the
    # embc10 (200k) and embc100 (2M) probe corpora are produced.
    #   python3 tools/gen_emb_clustered.py bench 200000   -> bench/embc10
    #   python3 tools/gen_emb_clustered.py bench 2000000  -> bench/embc100
    #   python3 tools/gen_emb_clustered.py bench 20000000 -> bench/embc1000
    n = int(sys.argv[2])
    name = sys.argv[3] if len(sys.argv) > 3 else f"embc{n // 20000}"
    (gen_big if n >= 10_000_000 else gen)(n, f"{OUTROOT}/{name}")
else:
    gen(2000, f"{OUTROOT}/embc0.1")
    gen(20000, f"{OUTROOT}/embc1")
