#!/usr/bin/env python3
"""Generate sf1-scale documents/embeddings for the round-9 scale bench.

Tooling only (like check_oracle.py) -- NOT part of the Scala library.
Mimics the driver's sf0.1 generative process by measuring its empirical
distributions and scaling 10x with the same shape:
  - documents: word frequencies, doc-length and language distributions,
    uniform sources, and the same ~5%-of-docs planted near-identical
    mutation pairs (sf0.1 shows ~250 J>=0.9 pairs / 5000 docs);
  - embeddings: iid unit-norm 64-dim gaussians, uniform labels (sf0.1
    measures as exactly that: no label cosine structure, pair rate at
    cos>=0.35 ~ the random 2.8-sigma tail).

Other tables are symlinked from sf0.1 (the sf1 bench queries only touch
documents/embeddings; Tables.load eagerly opens every file).
"""
import collections
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/bench/sf1"
SCALE = 10
SEED = 42

os.makedirs(OUT, exist_ok=True)
rng = np.random.RandomState(SEED)

# ---------------------------------------------------------------- documents
src = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
n_out = len(src) * SCALE

wordfreq = collections.Counter()
lengths = []
for t in src.text:
    ws = t.split()
    lengths.append(len(ws))
    wordfreq.update(ws)
vocab = sorted(wordfreq)
probs = np.array([wordfreq[w] for w in vocab], dtype=float)
probs /= probs.sum()
langs = src.lang.value_counts(normalize=True)
n_sources = src.source.nunique()

# Planted near-identical pairs at the sf0.1 rate (pairs per doc).
pair_rate = 256 / len(src)  # q26 J>=0.6 pairs at sf0.1
n_planted = int(n_out * pair_rate)

lens = rng.choice(lengths, size=n_out)
lang_col = rng.choice(langs.index.values, size=n_out, p=langs.values)
texts = []
for i in range(n_out):
    texts.append(" ".join(rng.choice(vocab, size=lens[i], p=probs)))

# Mutate: doc i copies an earlier doc with 1-2 word substitutions, like
# the near-identical (J>=0.9) population sf0.1 plants.
dup_targets = rng.choice(np.arange(n_out // 2, n_out), size=n_planted,
                         replace=False)
for i in dup_targets:
    j = rng.randint(0, n_out // 2)
    ws = texts[j].split()
    for _ in range(rng.randint(1, 3)):
        ws[rng.randint(0, len(ws))] = vocab[rng.randint(0, len(vocab))]
    texts[i] = " ".join(ws)

docs = pd.DataFrame({
    "doc_id": np.arange(n_out, dtype=np.int64),
    "text": texts,
    "lang": lang_col,
    "source": [f"src{i % n_sources}" for i in
               rng.randint(0, n_sources * 1000, size=n_out)],
})
docs["n_chars"] = docs.text.str.len().astype(np.int64)
pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
               f"{OUT}/documents.parquet")
print(f"documents: {len(docs)} rows, {n_planted} planted mutations")

# --------------------------------------------------------------- embeddings
emb_src = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
n_emb = len(emb_src) * SCALE
E = rng.randn(n_emb, 64).astype(np.float32)
E /= np.linalg.norm(E, axis=1, keepdims=True)
emb = pa.table({
    "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
    "embedding": pa.array([e for e in E],
                          type=pa.list_(pa.float32())),
    "label": pa.array(rng.randint(0, 10, size=n_emb).astype(np.int32)),
})
pq.write_table(emb, f"{OUT}/embeddings.parquet")
print(f"embeddings: {n_emb} rows")

# ----------------------------------------------------- symlink other tables
for name in ["region", "nation", "customer", "supplier", "part", "orders",
             "lineitem", "events"]:
    dst = f"{OUT}/{name}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{SRC}/{name}.parquet", dst)
print("symlinked remaining tables from sf0.1")
