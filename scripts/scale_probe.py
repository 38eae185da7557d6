#!/usr/bin/env python
"""Empirical scaling probe for the pair-pipeline (dedup/ANN) family.

The 100 TB arguments in SCALE.md are analytical (candidate generation,
never all-pairs); this probe adds one measured decade: run the five
heaviest pair-pipeline queries UNMODIFIED on statistically same-shaped
corpora at 1x (sf0.1-sized) and 10x, and record the per-query scaling
exponent  e = log(t_10x / t_1x) / log(10)  — e ~= 1 is linear, e >= 2
would expose a hidden all-pairs stage.

No sf1 driver data exists, so the probe synthesizes its own inputs
(seeded, written under .scale/ — gitignored) with the structural knobs
that drive pair-pipeline cost held constant across scales:

- documents: empirical word unigram distribution and doc-length range
  sampled FROM the sf0.1 corpus; 20% of docs are near-copies of an
  earlier doc with 10% of tokens replaced, so near-dup pair density
  per document stays constant as n grows (pairs grow linearly, as in a
  real crawl where a page duplicates a bounded number of others).
- embeddings: 64-dim unit-normalized gaussian vectors; 10% are
  noised copies (cosine ~0.995) — constant per-vector dup density.
- part names: distinct 2-gram names over the sf0.1 color/part word
  vocabulary plus single-char-edit variants (10%), so the
  edit-distance join has a constant rate of true matches per name.
  (sf0.1 itself has only 64 distinct p_names — too small to measure —
  so the probe uses 2k/20k distinct names and notes the baseline
  difference.)

Interpretation note: near_dup_scorecard embeds brute-force exact twins
on a hash-capped 2000-doc universe; its exact stages are cap-bounded
BY DESIGN, so its exponent reflects only the candidate-generation
stages and should come out well below 1.

Usage: python scripts/scale_probe.py [--runs 2] [--out BENCH_SCALING_r6.json]
"""

from __future__ import annotations

import argparse
import gc
import json
import math
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALE_DIR = os.path.join(REPO, ".scale")
SRC_SF = "/root/testdata/sf0.1"

QUERIES_TO_PROBE = [
    "dedup_clusters",
    "minhash_lsh_portable",
    "semantic_dedup",
    "edit_distance_join",
    "near_dup_scorecard",
    "ngram_jaccard_dedup",
    "passage_dedup",
    "cdc_passage_dedup",
    "lm_perplexity",
    "corpus_pipeline",
    "embedding_dedup_clusters",
]


def _corpus_profile() -> tuple[list[str], np.ndarray, int, int]:
    """Empirical unigram vocabulary + probabilities and doc-length
    bounds from the sf0.1 documents table (driver-side, ~1 MB)."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT word, COUNT(*) AS c FROM (
            SELECT unnest(string_split(text, ' ')) AS word
            FROM read_parquet('{SRC_SF}/documents.parquet')
        ) WHERE length(word) > 0 GROUP BY word ORDER BY word
        """
    ).fetchall()
    lo, hi = con.execute(
        f"""
        SELECT MIN(len(string_split(text, ' '))), MAX(len(string_split(text, ' ')))
        FROM read_parquet('{SRC_SF}/documents.parquet')
        """
    ).fetchone()
    con.close()
    words = [r[0] for r in rows]
    counts = np.array([r[1] for r in rows], dtype=np.float64)
    return words, counts / counts.sum(), int(lo), int(hi)


def gen_documents(n: int, seed: int, path: str) -> None:
    rng = np.random.default_rng(seed)
    words, probs, lo, hi = _corpus_profile()
    warr = np.array(words, dtype=object)
    texts: list[str] = []
    for i in range(n):
        if i >= 5 and rng.random() < 0.20:
            # near-copy of a recent doc: replace ~10% of tokens
            src = texts[int(rng.integers(max(0, i - 200), i))].split(" ")
            k = max(1, len(src) // 10)
            idx = rng.choice(len(src), size=k, replace=False)
            repl = rng.choice(len(warr), size=k, p=probs)
            for j, w in zip(idx, repl):
                src[j] = warr[w]
            texts.append(" ".join(src))
        else:
            m = int(rng.integers(lo, hi + 1))
            texts.append(" ".join(warr[rng.choice(len(warr), size=m, p=probs)]))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, path)


def gen_embeddings(n: int, seed: int, path: str) -> None:
    """10% of vectors are noised copies of a BASE vector (never of
    another copy): copy-of-copy chains build long-diameter path graphs
    in the near-dup pair graph — a different regime than corpus dedup
    (the star-rounds fallback in clusters.py handles it, but the probe
    measures the production quasi-clique shape)."""
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, 64)).astype(np.float32)
    is_base = np.ones(n, dtype=bool)
    for i in range(1, n):
        if rng.random() < 0.10:
            lo = max(0, i - 100)
            base_ids = [j for j in range(lo, i) if is_base[j]]
            if base_ids:
                j = base_ids[int(rng.integers(0, len(base_ids)))]
                v[i] = v[j] + 0.05 * rng.standard_normal(64).astype(np.float32)
                is_base[i] = False
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(v), pa.list_(pa.float32())),
            "label": pa.array((np.arange(n) % 10).astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(tbl, path)


def gen_part(n_names: int, seed: int, path: str) -> None:
    """Distinct names with a constant rate of edit-distance-1 variants.

    True-match density must stay constant per name as n grows (else the
    probe measures output growth, not algorithm scaling — any exact
    join is Ω(output)).  Two rules enforce that: variants derive only
    from BASE names (no chains, whose transitive families pair
    quadratically), and the random tail is 8 letters (a short numeric
    tail put random same-word-family names within 2 edits of each
    other, which made TRUE pairs per name grow linearly with family
    size — measured 73× output for 10× names before the fix)."""
    import duckdb

    rng = np.random.default_rng(seed)
    con = duckdb.connect()
    vocab = [
        r[0]
        for r in con.execute(
            f"""
            SELECT DISTINCT unnest(string_split(p_name, ' '))
            FROM read_parquet('{SRC_SF}/part.parquet') ORDER BY 1
            """
        ).fetchall()
    ]
    con.close()
    names: list[str] = []
    bases: list[str] = []
    seen: set[str] = set()
    while len(names) < n_names:
        if bases and rng.random() < 0.10:
            base = bases[int(rng.integers(0, len(bases)))]
            pos = int(rng.integers(0, len(base)))
            cand = base[:pos] + chr(ord("a") + int(rng.integers(0, 26))) + base[pos + 1 :]
            is_base = False
        else:
            a, b = rng.choice(len(vocab), size=2, replace=False)
            tail = "".join(chr(ord("a") + c) for c in rng.integers(0, 26, size=8))
            cand = f"{vocab[a]} {vocab[b]} {tail}"
            is_base = True
        if cand not in seen:
            seen.add(cand)
            names.append(cand)
            if is_base:
                bases.append(cand)
    tbl = pa.table(
        {
            "p_partkey": pa.array(range(len(names)), pa.int64()),
            "p_name": pa.array(names, pa.string()),
        }
    )
    pq.write_table(tbl, path)


def build_scale(tag: str, docs: int, embs: int, names: int, seed: int) -> str:
    d = os.path.join(SCALE_DIR, tag)
    os.makedirs(d, exist_ok=True)
    marker = os.path.join(d, ".complete")
    if not os.path.exists(marker):
        gen_documents(docs, seed, os.path.join(d, "documents.parquet"))
        gen_embeddings(embs, seed + 1, os.path.join(d, "embeddings.parquet"))
        gen_part(names, seed + 2, os.path.join(d, "part.parquet"))
        open(marker, "w").close()
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SCALING_r6.json"))
    args = ap.parse_args()

    import sys

    sys.path.insert(0, REPO)
    from pedsnetdcc_spark.queries import QUERIES
    from pedsnetdcc_spark.session import build_session

    d1 = build_scale("x1", docs=5_000, embs=2_000, names=2_000, seed=7)
    d10 = build_scale("x10", docs=50_000, embs=20_000, names=20_000, seed=7)

    spark = build_session(app_name="scale_probe")
    # JVM warm
    QUERIES["dedup_clusters"](spark, d1).count()

    result: dict[str, dict[str, float]] = {}
    for name in QUERIES_TO_PROBE:
        times = {}
        for tag, d in (("x1", d1), ("x10", d10)):
            best = math.inf
            for _ in range(args.runs):
                gc.collect()
                t0 = time.time()
                QUERIES[name](spark, d).count()
                best = min(best, time.time() - t0)
            times[tag] = round(best, 3)
        exp = math.log(times["x10"] / times["x1"]) / math.log(10)
        result[name] = {**times, "exponent": round(exp, 3)}
        print(f"{name:24s} x1={times['x1']:7.2f}s x10={times['x10']:7.2f}s "
              f"exponent={exp:5.2f}", flush=True)

    with open(args.out, "w") as f:
        json.dump(
            {
                "probe": "pair-pipeline scaling, synthetic same-shaped corpora",
                "x1_rows": {"documents": 5000, "embeddings": 2000, "part_names": 2000},
                "x10_rows": {"documents": 50000, "embeddings": 20000, "part_names": 20000},
                "queries": result,
            },
            f,
            indent=2,
        )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
