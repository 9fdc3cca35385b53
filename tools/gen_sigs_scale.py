#!/usr/bin/env python3
"""Signature-only corpus for the MIH hamming-join decade probes.

Tooling only (like gen_docs_scale.py) -- NOT part of the Scala library.
The r16 probe measures the 50M-signature decade, where generating and
SIGNING 50M documents would cost far more than the join being measured
and add nothing: hammingNearPairs consumes only the (doc_id, simhash)
relation, and a 60-bit simhash corpus is statistically simple --
near-uniform signatures (each bit is the sign of a +/-1 sum over many
shingle hashes) plus planted near-pairs from edited documents.

This emits exactly that shape: uniform 60-bit signatures with near-dup
pairs planted at rate 0.0015 (the pair rate the doc-derived corpora
measure: 725 pairs/50k, 7590/500k, 75004/5M) as copies of an earlier
signature with 1..5 bits flipped (the measured hamming of 1-2 word
edits at 60 bits). Chance pairs on top are real pairs and count equally
under every chunk geometry.

  python3 tools/gen_sigs_scale.py 50 bench/sigs50M   # 50M signatures
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N = int(float(sys.argv[1]) * 1e6)
OUT = sys.argv[2] if len(sys.argv) > 2 else "bench/sigs50M"
SEED = 99
PAIR_RATE = 0.0015
CHUNK = 5_000_000

os.makedirs(OUT, exist_ok=True)
rng = np.random.RandomState(SEED)
writer = None
planted = 0
for lo in range(0, N, CHUNK):
    m = min(CHUNK, N - lo)
    sig = rng.randint(0, 1 << 62, size=m, dtype=np.int64) & ((1 << 60) - 1)
    # Planted near-pairs stay within a chunk (copy from the chunk's
    # first half), mirroring gen_docs_scale.py -- the pair structure,
    # not cross-chunk placement, is what the probe measures.
    n_pl = int(m * PAIR_RATE)
    dst = rng.choice(np.arange(m // 2, m), size=n_pl, replace=False)
    src = rng.randint(0, m // 2, size=n_pl)
    mutated = sig[src].copy()
    nflips = rng.randint(1, 6, size=n_pl)
    for j in range(5):
        bit = rng.randint(0, 60, size=n_pl).astype(np.int64)
        flip = np.where(nflips > j, np.int64(1) << bit, np.int64(0))
        mutated ^= flip
    sig[dst] = mutated
    planted += n_pl
    tbl = pa.table({
        "doc_id": np.arange(lo, lo + m, dtype=np.int64),
        "simhash": sig,
    })
    if writer is None:
        writer = pq.ParquetWriter(f"{OUT}/signatures.parquet", tbl.schema)
    writer.write_table(tbl)
writer.close()
print(f"signatures: {N} rows, {planted} planted near-copies (<=5 bit flips)")
