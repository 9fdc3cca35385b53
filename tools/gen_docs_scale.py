#!/usr/bin/env python3
"""Generate an N-x documents corpus for join-geometry scale probes.

Tooling only (like gen_sf1.py) -- NOT part of the Scala library. Same
empirical recipe as gen_sf1.py's documents half (word frequencies,
doc-length/language distributions, planted near-identical mutation
pairs at the sf0.1 rate) but vectorized so 100x (~500k docs) generates
in minutes, and documents-only: every other table (embeddings included)
is symlinked from bench/sf1, since the MIH probe reads only documents
but Tables.load eagerly opens every file.

  python3 tools/gen_docs_scale.py 100 bench/sf10
"""
import collections
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
LINK_SRC = os.path.abspath("bench/sf1")
SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 100
OUT = sys.argv[2] if len(sys.argv) > 2 else "bench/sf10"
SEED = 42

os.makedirs(OUT, exist_ok=True)
rng = np.random.RandomState(SEED)

src = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
n_out = len(src) * SCALE

wordfreq = collections.Counter()
lengths = []
for t in src.text:
    ws = t.split()
    lengths.append(len(ws))
    wordfreq.update(ws)
vocab = np.array(sorted(wordfreq))
probs = np.array([wordfreq[w] for w in vocab], dtype=float)
probs /= probs.sum()
langs = src.lang.value_counts(normalize=True)
n_sources = src.source.nunique()

pair_rate = 256 / len(src)
n_planted = int(n_out * pair_rate)

# Generate in row-group chunks so SCALE=1000 (5M docs, ~500M words)
# never materializes the whole corpus in memory; planted near-dup
# mutations stay within a chunk (copy from the chunk's first half) —
# the pair structure, not cross-chunk placement, is what the probes
# measure.
CHUNK = 250000
writer = None
planted_total = 0
for lo in range(0, n_out, CHUNK):
    hi = min(lo + CHUNK, n_out)
    m = hi - lo
    lens = rng.choice(lengths, size=m)
    lang_col = rng.choice(langs.index.values, size=m, p=langs.values)
    bounds = np.concatenate([[0], np.cumsum(lens)])
    all_words = rng.choice(vocab, size=int(bounds[-1]), p=probs)
    texts = [" ".join(all_words[bounds[i]:bounds[i + 1]])
             for i in range(m)]
    n_pl = int(m * pair_rate)
    dup_targets = rng.choice(np.arange(m // 2, m), size=n_pl,
                             replace=False)
    for i in dup_targets:
        j = rng.randint(0, m // 2)
        ws = texts[j].split()
        for _ in range(rng.randint(1, 3)):
            ws[rng.randint(0, len(ws))] = vocab[rng.randint(0, len(vocab))]
        texts[i] = " ".join(ws)
    planted_total += n_pl
    docs = pd.DataFrame({
        "doc_id": np.arange(lo, hi, dtype=np.int64),
        "text": texts,
        "lang": lang_col,
        "source": [f"src{i % n_sources}" for i in
                   rng.randint(0, n_sources * 1000, size=m)],
    })
    docs["n_chars"] = docs.text.str.len().astype(np.int64)
    tbl = pa.Table.from_pandas(docs, preserve_index=False)
    if writer is None:
        writer = pq.ParquetWriter(f"{OUT}/documents.parquet", tbl.schema)
    writer.write_table(tbl)
writer.close()
print(f"documents: {n_out} rows, {planted_total} planted mutations")

for name in ["region", "nation", "customer", "supplier", "part",
             "orders", "lineitem", "events", "embeddings"]:
    dst = f"{OUT}/{name}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{LINK_SRC}/{name}.parquet", dst)
print(f"symlinked remaining tables from {LINK_SRC}")
