#!/usr/bin/env python3
"""Generate the deterministic near-dup / ANN fixtures (committed parquet).

Upgrades the LSH family (q46/q47/q53) from rows-only driver checks to real
DuckDB oracles: over these fixtures the ground truth (exact shingle
Jaccard; exact cosine top-k) IS SQL-computable, and the engine's LSH
output is deterministic (fixed hash seeds / fixed projection planes), so
hash-equality against the recomputed ground truth is a meaningful gate.

- neardup_docs.parquet (doc_id, lang, text):
    12 base docs (doc_id 0..11) of 60 words over a PER-DOC disjoint
    vocabulary; each has a near-duplicate partner (doc_id+100) with one
    word replaced (trigram Jaccard ~0.9 — high enough that the 4x3 LSH
    banding catches every planted pair deterministically); 6 unrelated
    singletons (doc_id 200..205) on their own vocabularies (Jaccard 0 and
    SimHash-far from everything, so both metrics cleanly separate planted
    pairs from noise). One seeded RNG, committed output.
- neardup_embeddings.parquet (vec_id, embedding ARRAY<FLOAT>, label):
    10 well-separated unit-norm cluster centers in 64-d; 10 members each
    (center + small noise, renormalized), vec_id = 100*c + j so members
    of cluster c share the hundreds digit; queries are vec_id % 100 == 0.

Rerun only to regenerate after changing this script; outputs are
committed so the oracle and the engine always see identical bytes.
"""
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = "/root/repo/fixtures"

def vocab(tag):
    return [f"{tag}w{k}" for k in range(36)]


def make_docs():
    rng = random.Random(7)
    rows = []
    for i in range(12):
        voc = vocab(f"d{i}")
        words = [rng.choice(voc) for _ in range(60)]
        rows.append((i, "en", " ".join(words)))
        # near-dup partner: one word replaced (trigram Jaccard ~0.9)
        dup = list(words)
        dup[17] = "replaced"
        rows.append((i + 100, "en", " ".join(dup)))
    for i in range(6):
        voc = vocab(f"s{i}")
        words = [rng.choice(voc) for _ in range(60)]
        rows.append((200 + i, "en", " ".join(words)))
    rows.sort()
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "lang": pa.array([r[1] for r in rows]),
        "text": pa.array([r[2] for r in rows]),
    })
    pq.write_table(t, f"{OUT}/neardup_docs.parquet")


def make_embeddings():
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    ids, vecs, labels = [], [], []
    for c in range(10):
        for j in range(10):
            # noise 0.05 keeps intra-cluster cosine ~0.93 (angle ~21°) so
            # the 6x4 sign-LSH catches every true neighbor deterministically
            v = centers[c] if j == 0 else centers[c] + 0.05 * rng.standard_normal(64)
            v = v / np.linalg.norm(v)
            ids.append(100 * c + j)
            vecs.append(v.astype(np.float32))
            labels.append(f"c{c}")
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels),
    })
    pq.write_table(t, f"{OUT}/neardup_embeddings.parquet")


if __name__ == "__main__":
    make_docs()
    make_embeddings()
    print("wrote neardup_docs.parquet, neardup_embeddings.parquet")
