"""Generate a ~10x-scale documents/embeddings pair for the scale-up sweep.

The driver testdata tops out at sf0.1 (5k documents / 2k embeddings).
SCALE.md's round-3 lesson (`max_bucket` guard divergence) was only visible
one scale up, so this tool builds a 10x corpus with the same shape as the
driver's generator — word-salad text over a small vocabulary, langs/sources
with the same skew — PLUS adversarial structure the driver data lacks:

- exact duplicate groups (content-digest dedup must collapse them),
- near-duplicate families with 1-3 word edits (MinHash / SimHash /
  n-gram Jaccard candidate generation must find them),
- NULL texts (null-semantics divergence between Spark left_anti and SQL
  NOT IN was a real round-3 advisor finding),
- a "whale" shingle present in ~20% of docs (max_df pruning must fire),
- embedding twins at cosine ~1 (semantic dedup) inside 10 gaussian
  clusters (IVF / k-means paths see realistic geometry).

Output: {out}/documents.parquet, {out}/embeddings.parquet, plus symlinks
to the sf0.1 parquet for the relational tables so tools/check_correctness.py
can point straight at the directory.

Usage: python tools/gen_scale_docs.py [out_dir] [mult]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark line column order small sort fast value scan hash slow group "
    "batch agg filter query big key window row part table stream merge data "
    "vector customer join the a"
).split()
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def gen_documents(rng: np.random.Generator, n: int):
    docs: list[str | None] = []
    base = int(n * 0.90)
    for _ in range(base):
        ln = int(rng.integers(8, 100))
        words = rng.choice(VOCAB, size=ln)
        docs.append(" ".join(words))
    # whale shingle: a fixed 3-gram inserted into ~20% of the base docs
    whale = "spark fast table"
    for i in rng.choice(base, size=int(base * 0.20), replace=False):
        docs[i] = f"{docs[i]} {whale}"
    # exact duplicate groups (~4% of rows)
    n_exact = int(n * 0.04)
    srcs = rng.choice(base, size=n_exact)
    docs.extend(docs[int(s)] for s in srcs)
    # near-duplicates: copy with 1-3 single-word substitutions (~5%)
    n_near = int(n * 0.05)
    for s in rng.choice(base, size=n_near):
        toks = docs[int(s)].split()
        for _ in range(int(rng.integers(1, 4))):
            toks[int(rng.integers(0, len(toks)))] = str(rng.choice(VOCAB))
        docs.append(" ".join(toks))
    # NULL texts (~0.5%)
    docs.extend([None] * (n - len(docs)))
    order = rng.permutation(len(docs))
    docs = [docs[i] for i in order]
    lang = rng.choice(LANGS, size=len(docs), p=LANG_P)
    source = np.char.add("src", rng.integers(0, 20, size=len(docs)).astype(str))
    n_chars = np.array([len(d) if d is not None else 0 for d in docs], dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
            "text": pa.array(docs, type=pa.string()),
            "lang": pa.array(lang),
            "source": pa.array(source),
            "n_chars": pa.array(n_chars),
        }
    )


def gen_embeddings(rng: np.random.Generator, n: int, dim: int = 64):
    centroids = rng.normal(0.0, 0.25, size=(10, dim))
    label = rng.integers(0, 10, size=n)
    vecs = centroids[label] + rng.normal(0.0, 0.08, size=(n, dim))
    # cosine twins: 2% of vectors are a tiny perturbation of an earlier one
    n_twin = int(n * 0.02)
    src = rng.choice(n - n_twin, size=n_twin)
    vecs[n - n_twin :] = vecs[src] * (1.0 + rng.normal(0, 1e-4, size=(n_twin, 1)))
    label[n - n_twin :] = label[src]
    vecs = np.clip(vecs, -0.6, 0.6).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(label.astype(np.int32)),
        }
    )


def gen_events(rng: np.random.Generator, n: int):
    """10x events with adversarial structure the driver table lacks:

    - a WHALE user (id 777) carrying ~5% of all events — skew for
      sessionization / latest-per-key / the salted map-pipeline paths,
    - timestamp-tie bursts: ~1% of events share an exact timestamp with 9
      others, plus (user, ts) collision pairs — deterministic tie-breaks in
      window queries must agree across engines or the hash gate flips,
    - NULL values (~1%) — aggregate/percentile null handling,
    - ~50k distinct users — the HLL error-bound verdicts face a 25x-larger
      cardinality than the sf0.1 gate.
    Same span as the driver's table (2024-01-01 + ~52 days) at 10x density;
    event_id stays the global order like the driver generator.
    """
    gaps = rng.exponential(4.5e6, size=n)  # microseconds
    ts_us = (1704067200_000_000 + np.cumsum(gaps)).astype(np.int64)
    # timestamp-tie bursts: groups of 10 share one exact ts
    n_burst = n // 1000
    starts = rng.choice(n - 10, size=n_burst, replace=False)
    for s in starts:
        ts_us[s : s + 10] = ts_us[s]
    user = rng.integers(0, 50000, size=n)
    whale = rng.random(n) < 0.05
    user[whale] = 777
    # (user, ts) collisions: consecutive same-user same-ts pairs
    for s in rng.choice(n - 1, size=n // 2000, replace=False):
        user[s + 1] = user[s]
        ts_us[s + 1] = ts_us[s]
    etype = rng.choice(
        ["view", "click", "purchase", "error", "signup"],
        size=n,
        p=[0.55, 0.25, 0.1, 0.06, 0.04],
    )
    value = np.round(rng.random(n) * 200.0, 2)
    null_mask = rng.random(n) < 0.01
    k = rng.integers(0, 100, size=n)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts_us, type=pa.timestamp("us")),
            "user_id": pa.array(user.astype(np.int64)),
            "event_type": pa.array(etype),
            "value": pa.array(
                [None if m else float(v) for m, v in zip(null_mask, value)],
                type=pa.float64(),
            ),
            "props": pa.array([f'{{"k": {int(x)}}}' for x in k]),
        }
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf10x"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(20260814)
    pq.write_table(gen_documents(rng, 5000 * mult), f"{out}/documents.parquet")
    pq.write_table(gen_embeddings(rng, 2000 * mult), f"{out}/embeddings.parquet")
    ev = f"{out}/events.parquet"
    if os.path.islink(ev):
        os.unlink(ev)
    pq.write_table(gen_events(rng, 100000 * mult), ev)
    for t in "region nation customer supplier part orders lineitem".split():
        link = f"{out}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"/root/testdata/sf0.1/{t}.parquet", link)
    print(
        f"wrote {out}: documents={5000*mult} embeddings={2000*mult} events={100000*mult}"
    )


if __name__ == "__main__":
    main()
