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

Round 7 adds the CDM family (``--family cdm``): eras,
era-id pipeline, CDM transform chain, multi-site merge, interval
overlap join, id mapping, plus the distributed-mode surrogate-id
assigner — over synthetic clinical-shaped tables whose SCALE-INVARIANT
is users/customers (more patients at 10×, the same per-patient history
depth: events-per-user, orders-per-customer, and the concept dimension
are constant).  That is the axis a PEDSnet-style network actually
scales on, and it keeps per-key window/era work flat so a super-linear
exponent can only come from the engine plan, not the data shape.

Usage: python scripts/scale_probe.py [--runs 2] [--family pair|cdm|all]
       [--out BENCH_SCALING_r7.json]
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
    # round 8: the r7 flagship additions, never probed before
    "quality_classifier",
    "bpe_encode",
    "tfidf_top_terms",
    # round 8: the split-out deep scorecard (cap-bounded provers — its
    # exponent should read ~0 like its sibling's capped exact stages)
    "near_dup_scorecard_deep",
    # round 10 second half: exact-substring spans (shingle-linear, no
    # pair materialization — expect exponent ~1), line dedup (same
    # shape over coarser units), PQ/ADC ANN (fixed probe set: the
    # candidate-side Arrow pass should scale ~linearly)
    "duplicate_spans",
    "line_dedup",
    "ann_pq_topk",
    # image near-dup: the codec (encode+decode+resample per row) IS the
    # cost — expect ~linear in docs, Arrow-batched python
    "image_near_dup",
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


def gen_documents_deep(n: int, seed: int, path: str) -> None:
    """Chunked ``gen_documents`` for the x1000 point (5M docs ≈ 1.5 GB
    text): same corpus profile, same 20% near-copy rule over a rolling
    200-doc window (near-dup pair density per doc stays constant), but
    token sampling is vectorized per chunk (searchsorted over the
    cumulative unigram distribution — np.random.choice(p=...) re-cumsums
    the whole vocabulary per call) and rows stream through one
    ParquetWriter so peak memory is one chunk, not the corpus (the same
    pattern as build_cdm_deep_scale)."""
    rng = np.random.default_rng(seed)
    words, probs, lo, hi = _corpus_profile()
    warr = np.array(words, dtype=object)
    cum = np.cumsum(probs)
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    chunk = 200_000
    window: list[str] = []  # last 200 docs, the near-copy source pool
    with pq.ParquetWriter(path, schema) as writer:
        for base in range(0, n, chunk):
            cn = min(chunk, n - base)
            lens = rng.integers(lo, hi + 1, size=cn)
            flat = warr[np.searchsorted(cum, rng.random(int(lens.sum())))]
            offs = np.concatenate(([0], np.cumsum(lens)))
            texts: list[str] = []
            for i in range(cn):
                gi = base + i
                if gi >= 5 and rng.random() < 0.20:
                    # strictly the last 200 docs across the chunk
                    # boundary — matching gen_documents' rolling
                    # window, so near-dup locality is scale-invariant
                    pool = (window + texts)[-200:] if i < 200 else texts[-200:]
                    src = pool[int(rng.integers(0, len(pool)))].split(" ")
                    k = max(1, len(src) // 10)
                    idx = rng.choice(len(src), size=k, replace=False)
                    repl = warr[
                        np.searchsorted(cum, rng.random(k))
                    ]
                    for j, w in zip(idx, repl):
                        src[j] = w
                    texts.append(" ".join(src))
                else:
                    texts.append(" ".join(flat[offs[i]:offs[i + 1]]))
            writer.write_table(
                pa.table(
                    {
                        "doc_id": pa.array(
                            range(base, base + cn), pa.int64()
                        ),
                        "text": pa.array(texts, pa.string()),
                        "lang": pa.array(["en"] * cn, pa.string()),
                        "source": pa.array(
                            [f"src{i % 20}" for i in range(base, base + cn)],
                            pa.string(),
                        ),
                        "n_chars": pa.array(
                            [len(t) for t in texts], pa.int64()
                        ),
                    },
                    schema=schema,
                )
            )
            window = texts[-200:]


def build_pair_deep_scale(tag: str, docs: int, seed: int) -> str:
    """x1000 pair point: documents only — every probed pair_deep row
    (`quality_classifier`, `bpe_encode`, `tfidf_top_terms`,
    `lm_perplexity`, `corpus_pipeline`) reads no other table."""
    d = os.path.join(SCALE_DIR, tag)
    os.makedirs(d, exist_ok=True)
    marker = os.path.join(d, ".complete")
    if not os.path.exists(marker):
        gen_documents_deep(docs, seed, os.path.join(d, "documents.parquet"))
        open(marker, "w").close()
    return d


def build_sim_deep_scale(tag: str, embs: int, seed: int) -> str:
    """x1000 similarity point: embeddings only — every probed sim_deep
    row reads no other table.  Same generator (and 10% rolling-window
    near-copy regime) as the pair family's embeddings at every scale,
    including the seed offset `build_scale` uses."""
    d = os.path.join(SCALE_DIR, tag)
    os.makedirs(d, exist_ok=True)
    marker = os.path.join(d, ".complete")
    if not os.path.exists(marker):
        gen_embeddings(embs, seed + 1, os.path.join(d, "embeddings.parquet"))
        open(marker, "w").close()
    return d


def gen_media_sigs(n: int, seed: int, path: str) -> None:
    """Pair-density-CONTROLLED 64-bit media signatures for the band-join
    decades: 10/11 of rows are uniform random (near-zero incidental
    collisions at 32-bit blocks), 1/11 are planted near-copies of a
    random base row at 0-2 bit flips — every planted pair lands within
    the probe's max_hamming=2, so the TRUE pair count grows linearly
    with the corpus and the probe measures the join machinery, not the
    output stream.  (The REAL text-derived dHash corpus is pair-dense —
    203M true pairs at 550k images, measured round 10 — so its x1000
    extrapolation is output-bound by construction; see SCALE.md.)"""
    rng = np.random.default_rng(seed)
    n_cop = n // 11
    n_base = n - n_cop
    base = rng.integers(0, 1 << 64, size=n_base, dtype=np.uint64)
    src = rng.integers(0, n_base, size=n_cop)
    cop = base[src].copy()
    nflips = rng.integers(0, 3, size=n_cop)
    for f in (1, 2):
        m = nflips >= f
        bits = rng.integers(0, 64, size=n_cop).astype(np.uint64)
        cop[m] ^= np.uint64(1) << bits[m]
    sigs = np.concatenate([base, cop]).view(np.int64)
    tbl = pa.table(
        {
            "sid": pa.array(range(n), pa.int64()),
            "sig": pa.array(sigs, pa.int64()),
        }
    )
    pq.write_table(tbl, path)


def build_media_scale(tag: str, sigs: int, seed: int) -> str:
    d = os.path.join(SCALE_DIR, f"media_{tag}")
    os.makedirs(d, exist_ok=True)
    marker = os.path.join(d, ".complete")
    if not os.path.exists(marker):
        gen_media_sigs(sigs, seed, os.path.join(d, "media_sigs.parquet"))
        open(marker, "w").close()
    return d


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
    # bounded row groups: pyarrow's default writes the whole table as
    # ONE row group, and a row group is Spark's minimum read unit — at
    # 20M rows (x10000 decade) that is a ~5 GB single-task decompress,
    # which OOMs the 8g probe heap (measured: FAILED_READ_FILE ->
    # executor OOM on the first x10000 scan).  256k rows ≈ 64 MB.
    pq.write_table(tbl, path, row_group_size=262_144)


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


CDM_QUERIES_TO_PROBE = [
    "eras",
    "era_ids_pipeline",
    "cdm_transform",
    "merge_sites",
    "interval_overlap_join",
    "id_mapping",
]

EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]


def gen_events(n_users: int, per_user: int, seed: int, path: str) -> None:
    """Constant per-user event count — the scale-invariant (more
    patients, same history depth)."""
    rng = np.random.default_rng(seed)
    n = n_users * per_user
    user = np.repeat(np.arange(n_users, dtype=np.int64), per_user)
    et = np.array(EVENT_TYPES, dtype=object)[rng.integers(0, len(EVENT_TYPES), n)]
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + rng.integers(0, 30 * 24 * 3600, n).astype("timedelta64[s]")
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
            "user_id": pa.array(user),
            "event_type": pa.array(et, pa.string()),
            "value": pa.array(rng.random(n)),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(tbl, path)


def gen_customer(n: int, seed: int, path: str) -> None:
    rng = np.random.default_rng(seed)
    seg = np.array(
        ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"],
        dtype=object,
    )
    tbl = pa.table(
        {
            "c_custkey": pa.array(np.arange(n, dtype=np.int64)),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)], pa.string()),
            "c_nationkey": pa.array(rng.integers(0, 25, n).astype(np.int32)),
            "c_acctbal": pa.array(np.round(rng.random(n) * 10_000, 2)),
            "c_mktsegment": pa.array(seg[rng.integers(0, len(seg), n)], pa.string()),
        }
    )
    pq.write_table(tbl, path)


def gen_orders(n_cust: int, per_cust: int, seed: int, path: str) -> None:
    rng = np.random.default_rng(seed)
    n = n_cust * per_cust
    cust = np.repeat(np.arange(n_cust, dtype=np.int64), per_cust)
    base = np.datetime64("2015-01-01T00:00:00", "us")
    od = base + rng.integers(0, 9 * 365 * 24 * 3600, n).astype("timedelta64[s]")
    status = np.array(["O", "F", "P"], dtype=object)
    prio = np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"], dtype=object
    )
    tbl = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
            "o_custkey": pa.array(cust),
            "o_orderstatus": pa.array(status[rng.integers(0, 3, n)], pa.string()),
            "o_totalprice": pa.array(np.round(rng.random(n) * 100_000, 2)),
            "o_orderdate": pa.array(od.astype("datetime64[us]"), pa.timestamp("us")),
            "o_orderpriority": pa.array(prio[rng.integers(0, 5, n)], pa.string()),
        }
    )
    pq.write_table(tbl, path)


def build_cdm_scale(tag: str, users: int, customers: int, seed: int) -> str:
    """Clinical-shaped tables at constant per-entity depth; the concept
    dimension (part) is the SAME at both scales — dimensions don't grow
    with the fact data."""
    import shutil

    d = os.path.join(SCALE_DIR, tag)
    os.makedirs(d, exist_ok=True)
    marker = os.path.join(d, ".complete")
    if not os.path.exists(marker):
        gen_events(users, 67, seed, os.path.join(d, "events.parquet"))
        gen_customer(customers, seed + 1, os.path.join(d, "customer.parquet"))
        gen_orders(customers, 10, seed + 2, os.path.join(d, "orders.parquet"))
        shutil.copyfile(
            os.path.join(SRC_SF, "part.parquet"), os.path.join(d, "part.parquet")
        )
        open(marker, "w").close()
    return d


def _probe_id_assign_distributed(spark, d: str):
    """The W2 scale twin: distributed-mode contiguous surrogate ids
    (per-partition counts + offset broadcast) over the customer keys —
    the single-task window mode's equivalence-tested scale path."""
    from pedsnetdcc_spark.operators.ids import assign_surrogate_ids
    from pedsnetdcc_spark.sources.io import read_table

    cust = read_table(spark, d, "customer").select("c_custkey")
    return assign_surrogate_ids(
        cust, "dcc_id", "c_custkey", base=0, mode="distributed"
    )


def _probe_era_ids_distributed(spark, d: str):
    """The era_ids_pipeline flow with the id numbering in
    ``mode="distributed"`` (per-partition counts + offset broadcast) —
    the production-scale twin of the registry query, whose ``window``
    mode is the single-task ROW_NUMBER parity construct the oracle
    needs.  Same derive → count → reserve → assign → anti-join →
    assign → insert shape; only the numbering mode differs
    (equivalence-tested in test_operators_unit)."""
    import tempfile

    from pyspark.sql import functions as F

    from pedsnetdcc_spark.operators.eras import derive_eras
    from pedsnetdcc_spark.operators.ids import (
        IdAllocator,
        assign_surrogate_ids,
        reserve_negative,
    )
    from pedsnetdcc_spark.operators.upsert import insert_missing
    from pedsnetdcc_spark.sources.io import read_table

    key = ["user_id", "event_type", "era_start_date"]
    ev = (
        read_table(spark, d, "events")
        .select("user_id", "event_type", F.col("ts").cast("date").alias("sd"))
        .withColumn("ed", F.date_add("sd", 1))
    )

    def eras(src):
        return derive_eras(
            src, partition_keys=["user_id", "event_type"],
            start_col="sd", end_col="ed", gap_days=2,
        )

    master = eras(ev.where(F.col("event_type") == "click"))
    site = eras(ev)
    alloc = IdAllocator(tempfile.mktemp(suffix=".json", prefix="era_ids_"))
    base = reserve_negative(alloc, "era", master.count())
    master = assign_surrogate_ids(
        master, "era_id", key, base=base, mode="distributed"
    ).withColumn("era_id", F.col("era_id").cast("long"))
    unmapped = site.join(master.select(*key), key, "left_anti")
    base2 = reserve_negative(alloc, "era", unmapped.count())
    new_rows = assign_surrogate_ids(
        unmapped, "era_id", key, base=base2, mode="distributed"
    ).withColumn("era_id", F.col("era_id").cast("long"))
    return insert_missing(master, new_rows, keys=key)


#: Probe-only callables (not registry queries) keyed like queries.
EXTRA_PROBES = {
    "id_assign_distributed": _probe_id_assign_distributed,
    "era_ids_distributed": _probe_era_ids_distributed,
}


# ---------------------------------------------------------------------------
# Round-8: third CDM decade (x1000 — 100M events / 150M orders / 15M
# customers) for the two highest-exponent queries.  Generation is CHUNKED
# (10M-row parquet row groups through one ParquetWriter) with
# dictionary-encoded categorical columns, so the 150M-row orders table
# never exists as 150M Python objects; per-chunk seeded RNGs keep the
# distribution identical to the unchunked small-scale generators.
# ---------------------------------------------------------------------------

_CHUNK = 10_000_000


def _dict_col(rng, values: list[str], n: int) -> pa.Array:
    idx = rng.integers(0, len(values), n).astype(np.int32)
    return pa.DictionaryArray.from_arrays(pa.array(idx), pa.array(values))


def gen_events_chunked(n_users: int, per_user: int, seed: int, path: str) -> None:
    n = n_users * per_user
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.dictionary(pa.int32(), pa.string())),
            ("value", pa.float64()),
            ("props", pa.dictionary(pa.int32(), pa.string())),
        ]
    )
    base = np.datetime64("2024-01-01T00:00:00", "us")
    with pq.ParquetWriter(path, schema) as w:
        for c, lo in enumerate(range(0, n, _CHUNK)):
            hi = min(lo + _CHUNK, n)
            m = hi - lo
            rng = np.random.default_rng(seed * 1_000_003 + c)
            ts = base + rng.integers(0, 30 * 24 * 3600, m).astype("timedelta64[s]")
            w.write_table(
                pa.table(
                    {
                        "event_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
                        "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
                        "user_id": pa.array((np.arange(lo, hi) // per_user).astype(np.int64)),
                        "event_type": _dict_col(rng, EVENT_TYPES, m),
                        "value": pa.array(rng.random(m)),
                        "props": _dict_col(rng, ["{}"], m),
                    },
                    schema=schema,
                )
            )


def gen_customer_chunked(n: int, seed: int, path: str) -> None:
    seg = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    schema = pa.schema(
        [
            ("c_custkey", pa.int64()),
            ("c_name", pa.string()),
            ("c_nationkey", pa.int32()),
            ("c_acctbal", pa.float64()),
            ("c_mktsegment", pa.dictionary(pa.int32(), pa.string())),
        ]
    )
    with pq.ParquetWriter(path, schema) as w:
        for c, lo in enumerate(range(0, n, _CHUNK)):
            hi = min(lo + _CHUNK, n)
            m = hi - lo
            rng = np.random.default_rng(seed * 1_000_003 + c)
            names = np.char.add(
                "Customer#",
                np.char.zfill(np.arange(lo, hi).astype("U9"), 9),
            )
            w.write_table(
                pa.table(
                    {
                        "c_custkey": pa.array(np.arange(lo, hi, dtype=np.int64)),
                        "c_name": pa.array(names),
                        "c_nationkey": pa.array(rng.integers(0, 25, m).astype(np.int32)),
                        "c_acctbal": pa.array(np.round(rng.random(m) * 10_000, 2)),
                        "c_mktsegment": _dict_col(rng, seg, m),
                    },
                    schema=schema,
                )
            )


def gen_orders_chunked(n_cust: int, per_cust: int, seed: int, path: str) -> None:
    n = n_cust * per_cust
    schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderstatus", pa.dictionary(pa.int32(), pa.string())),
            ("o_totalprice", pa.float64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.dictionary(pa.int32(), pa.string())),
        ]
    )
    base = np.datetime64("2015-01-01T00:00:00", "us")
    prio = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    with pq.ParquetWriter(path, schema) as w:
        for c, lo in enumerate(range(0, n, _CHUNK)):
            hi = min(lo + _CHUNK, n)
            m = hi - lo
            rng = np.random.default_rng(seed * 1_000_003 + c)
            od = base + rng.integers(0, 9 * 365 * 24 * 3600, m).astype("timedelta64[s]")
            w.write_table(
                pa.table(
                    {
                        "o_orderkey": pa.array(np.arange(lo, hi, dtype=np.int64)),
                        "o_custkey": pa.array((np.arange(lo, hi) // per_cust).astype(np.int64)),
                        "o_orderstatus": _dict_col(rng, ["O", "F", "P"], m),
                        "o_totalprice": pa.array(np.round(rng.random(m) * 100_000, 2)),
                        "o_orderdate": pa.array(od.astype("datetime64[us]"), pa.timestamp("us")),
                        "o_orderpriority": _dict_col(rng, prio, m),
                    },
                    schema=schema,
                )
            )


def build_cdm_deep_scale(tag: str, users: int, customers: int, seed: int) -> str:
    """Same shape/invariant as build_cdm_scale, chunked generation for
    the x1000 point."""
    import shutil

    d = os.path.join(SCALE_DIR, tag)
    os.makedirs(d, exist_ok=True)
    marker = os.path.join(d, ".complete")
    if not os.path.exists(marker):
        gen_events_chunked(users, 67, seed, os.path.join(d, "events.parquet"))
        gen_customer_chunked(customers, seed + 1, os.path.join(d, "customer.parquet"))
        gen_orders_chunked(customers, 10, seed + 2, os.path.join(d, "orders.parquet"))
        shutil.copyfile(
            os.path.join(SRC_SF, "part.parquet"), os.path.join(d, "part.parquet")
        )
        open(marker, "w").close()
    return d


# ---------------------------------------------------------------------------
# Round-8: streaming family — the state-bound proof (round-7 verdict
# item 3).  50 time-ordered micro-batches through the two stateful
# operators at 1x/10x KEY cardinality; per-batch wall time and
# state-store rows come from the engine's own StreamingQueryProgress.
# The claims under test: per-batch cost is FLAT in stream position
# (no O(history) term), and state rows PLATEAU at (keys x horizon
# depth) — bounded by the watermark+gap horizon, not stream length.
# ---------------------------------------------------------------------------

_STREAM_BATCHES = 50


def gen_stream_batches(users: int, n_batches: int, seed: int, src: str) -> int:
    """Time-ordered micro-batch files ``batch_000..NNN.parquet``: batch
    b covers days [2b, 2b+2).  Each user emits one event per 'on' day
    (3-on/4-off weekly bursts, so eras keep closing and state keeps
    flushing); ~10% of rows duplicate a text from the SAME window
    (inside the dedup watermark).  Returns total rows."""
    os.makedirs(src, exist_ok=True)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    total = 0
    for b in range(n_batches):
        rng = np.random.default_rng(seed * 7_900_153 + b)
        rows_u, rows_d = [], []
        for day in (2 * b, 2 * b + 1):
            if day % 7 < 3:  # burst days
                uid = np.arange(users, dtype=np.int64)
                off = rng.integers(0, 86_400, users)
                ts = base + np.timedelta64(day * 86_400, "s") + off.astype("timedelta64[s]")
                rows_u.append(uid)
                rows_d.append(ts.astype("datetime64[us]"))
        if not rows_u:
            # keep one heartbeat row so every file forms a batch and the
            # watermark advances monotonically
            rows_u = [np.array([0], dtype=np.int64)]
            rows_d = [
                np.array([base + np.timedelta64(2 * b * 86_400, "s")], "datetime64[us]")
            ]
        uid = np.concatenate(rows_u)
        ts = np.concatenate(rows_d)
        n = len(uid)
        doc_id = np.arange(total, total + n, dtype=np.int64)
        # ~10% duplicates of another doc in this window → dropped by the
        # watermark-bounded dedup, state stays horizon-local
        src_idx = rng.integers(0, n, n)
        is_dup = rng.random(n) < 0.10
        text_ids = np.where(is_dup, doc_id[src_idx], doc_id)
        texts = np.char.add("doc text ", text_ids.astype("U12"))
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(doc_id),
                    "user_id": pa.array(uid),
                    "ts": pa.array(ts, pa.timestamp("us")),
                    "text": pa.array(texts),
                }
            ),
            os.path.join(src, f"batch_{b:03d}.parquet"),
        )
        total += n
    return total


def _drain_stream(sdf, sink: str, ckpt: str, timeout: int = 3600):
    q = (
        sdf.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout):
            raise TimeoutError("stream probe did not drain")
        return list(q.recentProgress)
    finally:
        q.stop()


def _stream_metrics(progs) -> dict:
    import statistics

    data = [p for p in progs if p.get("numInputRows", 0) > 0]
    durs = [p["batchDuration"] for p in data]
    states = [
        sum(op.get("numRowsTotal", 0) for op in p.get("stateOperators", []))
        for p in progs
    ]
    # guard the fifth-slices for short streams: with < 5 data batches
    # len//5 = 0 would make first empty / last the whole list and
    # statistics.mean([]) raises (ADVICE r8)
    fifth = max(1, len(durs) // 5)
    first, last = durs[:fifth], durs[-fifth:]
    return {
        "n_data_batches": len(data),
        "input_rows": int(sum(p["numInputRows"] for p in data)),
        "mean_batch_ms_first_fifth": round(statistics.mean(first), 1),
        "mean_batch_ms_last_fifth": round(statistics.mean(last), 1),
        "batch_ms_growth_ratio": round(
            statistics.mean(last) / statistics.mean(first), 3
        ),
        "state_rows_peak": int(max(states) if states else 0),
        "state_rows_final": int(states[-1] if states else 0),
    }


def probe_streaming(spark, tag: str, users: int, seed: int) -> dict:
    import shutil
    import tempfile

    from pedsnetdcc_spark.streaming.incremental import (
        streaming_exact_dedup,
        streaming_interval_eras,
    )

    src = os.path.join(SCALE_DIR, f"stream_{tag}")
    marker = os.path.join(src, ".complete")
    if not os.path.exists(marker):
        gen_stream_batches(users, _STREAM_BATCHES, seed, src)
        open(marker, "w").close()
    out: dict = {"users": users, "batches": _STREAM_BATCHES}
    schema = "doc_id long, user_id long, ts timestamp, text string"

    work = tempfile.mkdtemp(prefix=f"stream_probe_{tag}_")
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        from pyspark.sql import functions as F

        iv = stream.select(
            "user_id",
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("end_ts"),
        )
        t0 = time.time()
        progs = _drain_stream(
            streaming_interval_eras(
                iv, ["user_id"], "start_ts", "end_ts",
                gap_days=2, watermark="3 days",
            ),
            os.path.join(work, "eras_sink"),
            os.path.join(work, "eras_ckpt"),
        )
        m = _stream_metrics(progs)
        m["wall_s"] = round(time.time() - t0, 2)
        out["interval_eras"] = m

        stream2 = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        t0 = time.time()
        progs = _drain_stream(
            streaming_exact_dedup(
                stream2, "doc_id", "text", ts_col="ts", watermark="4 days"
            ),
            os.path.join(work, "dedup_sink"),
            os.path.join(work, "dedup_ckpt"),
        )
        m = _stream_metrics(progs)
        m["wall_s"] = round(time.time() - t0, 2)
        out["exact_dedup"] = m

        # The LSH index is the ONE stateful operator whose state grows
        # by design — the state IS the near-dup index (one row per
        # (band, bucket), ids+sigs inside).  The claims under test here
        # differ from the watermark-bounded pair: state grows LINEARLY
        # in distinct signed content (not with batches), and per-batch
        # cost stays FLAT because max_bucket bounds every bucket's
        # stored membership (the NeMo-style hot-bucket guard) — an
        # uncapped degenerate bucket would make late batches quadratic.
        from pedsnetdcc_spark.streaming.incremental import streaming_lsh_near_dup

        stream3 = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        t0 = time.time()
        progs = _drain_stream(
            streaming_lsh_near_dup(
                stream3, "doc_id", "text", num_hashes=8, num_bands=4,
                max_bucket=64,
            ),
            os.path.join(work, "lsh_sink"),
            os.path.join(work, "lsh_ckpt"),
        )
        m = _stream_metrics(progs)
        m["wall_s"] = round(time.time() - t0, 2)
        out["lsh_index"] = m
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


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


def build_r10_scale(tag: str, cust: int, seed: int) -> str:
    """Round-10 additions family: orders (for the generation diff) at
    constant per-customer depth; the documents side reuses the pair
    family's corpora (same dir tags) via :func:`build_scale`."""
    d = os.path.join(SCALE_DIR, f"r10_{tag}")
    os.makedirs(d, exist_ok=True)
    marker = os.path.join(d, ".complete")
    if not os.path.exists(marker):
        gen_orders(cust, 10, seed + 1, os.path.join(d, "orders.parquet"))
        open(marker, "w").close()
    return d


def _cpu_ticks():
    """(steal, total) ticks from /proc/stat — same capture bench.py
    carries (round-13 §13); gives every recorded scaling number an
    in-band hypervisor-throttle note so 8-vs-32 / decade adjudications
    need no hand-argued box-noise appendix (round-13 verdict item 7)."""
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals[:8])
    except (OSError, ValueError, IndexError):  # pragma: no cover
        return None


def _steal_pct(before, after):
    if not before or not after:
        return None
    ds, dt = after[0] - before[0], after[1] - before[1]
    return round(100.0 * ds / dt, 2) if dt > 0 else None


def _probe_family(spark, queries, names, extra, points, runs: int):
    """``points`` = [(tag, dir, scale_multiple), ...] in ascending
    scale; exponents are fitted between consecutive points and overall
    (first→last).  Each point also records ``steal_pct_<tag>`` — the
    hypervisor steal across that point's best-of-N window."""
    result: dict[str, dict[str, float]] = {}
    for name in names:
        fn = extra.get(name) or queries[name]
        times = {}
        steals = {}
        for tag, d, _mult in points:
            best = math.inf
            ticks0 = _cpu_ticks()
            for _ in range(runs):
                gc.collect()
                t0 = time.time()
                fn(spark, d).count()
                best = min(best, time.time() - t0)
                # operator-internal caches must not make run 2 (or the
                # other scale) a partial replay
                spark.catalog.clearCache()
            times[tag] = round(best, 3)
            steals[tag] = _steal_pct(ticks0, _cpu_ticks())
        entry: dict[str, float] = dict(times)
        for tag, s in steals.items():
            if s is not None:
                entry[f"steal_pct_{tag}"] = s
        for (t_a, _, m_a), (t_b, _, m_b) in zip(points, points[1:]):
            e = math.log(times[t_b] / times[t_a]) / math.log(m_b / m_a)
            entry[f"exponent_{t_a}_{t_b}"] = round(e, 3)
        if len(points) >= 2:
            first, last = points[0], points[-1]
            overall = math.log(times[last[0]] / times[first[0]]) / math.log(
                last[2] / first[2]
            )
            entry["exponent"] = round(overall, 3)
        result[name] = entry
        shown = " ".join(f"{t}={times[t]:7.2f}s" for t, _, _ in points)
        exp_shown = entry.get("exponent")
        print(
            f"{name:24s} {shown} exponent="
            f"{exp_shown if exp_shown is not None else 'n/a (1 point)'}",
            flush=True,
        )
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--family",
        choices=[
            "pair", "cdm", "streaming", "cdm_deep", "pair_deep", "pair_deep4",
            "sim_deep", "media_deep", "span_index", "r10", "all",
        ],
        default="all",
    )
    ap.add_argument(
        "--span-10000x",
        action="store_true",
        help="add the x10000 point to the span_index family (50M docs "
        "split 90/10 — the fourth measured decade; generates the "
        "pair_x10000 corpus, ~5.8 GB, on first use)",
    )
    ap.add_argument(
        "--span-points",
        help="span_index family: comma-separated decade tags to run "
        "(e.g. d50000k) — earlier decades' numbers are kept from the "
        "merged output file, so one point can be (re-)measured without "
        "re-running the rest; exponents recompute over every decade "
        "present after the merge",
    )
    ap.add_argument(
        "--sim-10000x",
        action="store_true",
        help="add the x10000 point to the sim_deep family (20M vectors "
        "— the fourth measured decade; generates the sim_x10000 "
        "corpus, ~5.5 GB, on first use)",
    )
    ap.add_argument(
        "--sim-points",
        help="sim_deep family: comma-separated decade tags to run "
        "(e.g. x10000) — other decades' numbers are kept from the "
        "merged output file; exponents recompute over every decade "
        "present after the merge",
    )
    ap.add_argument(
        "--cdm-100x",
        action="store_true",
        help="add a 100x point to the CDM family (10M events, 15M "
        "orders, 1.5M customers — two measured decades)",
    )
    ap.add_argument(
        "--pair-100x",
        action="store_true",
        help="add a 100x point to the pair family (500k docs, 200k "
        "embeddings, 200k part names — two measured decades)",
    )
    ap.add_argument(
        "--streaming-100x",
        action="store_true",
        help="add a 100x point to the streaming family (50k users over "
        "the same 50 micro-batches — two measured decades)",
    )
    ap.add_argument(
        "--r10-1000x",
        action="store_true",
        help="add a x1000 point to the r10 family (150M orders for the "
        "generation diff; 5M docs — the pair_deep corpus — for the "
        "WebDataset sink/source)",
    )
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SCALING_r10.json"))
    ap.add_argument(
        "--only",
        help="comma-separated query names: probe just these (re-measuring "
        "one query after a fix without re-running the family)",
    )
    args = ap.parse_args()
    if args.only:
        keep = set(args.only.split(","))
        global QUERIES_TO_PROBE, CDM_QUERIES_TO_PROBE
        QUERIES_TO_PROBE = [q for q in QUERIES_TO_PROBE if q in keep]
        CDM_QUERIES_TO_PROBE = [q for q in CDM_QUERIES_TO_PROBE if q in keep]

    import sys

    sys.path.insert(0, REPO)
    from pedsnetdcc_spark.queries import QUERIES
    from pedsnetdcc_spark.session import build_session

    spark = build_session(app_name="scale_probe")
    # merge into an existing output so families can be probed
    # incrementally (streaming today, cdm_deep tomorrow) without
    # clobbering earlier results
    out = {"probe": "1x vs 10x same-shaped synthetic scaling", "families": {}}
    if os.path.exists(args.out):
        with open(args.out) as f:
            out = json.load(f)
        out.setdefault("families", {})

    if args.family in ("pair", "all"):
        points = [
            ("x1", build_scale("x1", docs=5_000, embs=2_000, names=2_000, seed=7), 1),
            ("x10", build_scale("x10", docs=50_000, embs=20_000, names=20_000, seed=7), 10),
        ]
        rows = {
            "x1_rows": {"documents": 5000, "embeddings": 2000, "part_names": 2000},
            "x10_rows": {"documents": 50000, "embeddings": 20000, "part_names": 20000},
        }
        if args.pair_100x:
            points.append(
                (
                    "x100",
                    build_scale(
                        "x100", docs=500_000, embs=200_000, names=200_000, seed=7
                    ),
                    100,
                )
            )
            rows["x100_rows"] = {
                "documents": 500_000,
                "embeddings": 200_000,
                "part_names": 200_000,
            }
        def _lsh_auto_probe(spark, d):
            # the UNCAPPED production LSH near-dup path with auto bits
            # (the registry entries run it through capped prover
            # universes, so the probe exercises it directly)
            from pedsnetdcc_spark.datapipe.similarity import (
                embedding_near_dup_pairs_lsh,
            )
            from pedsnetdcc_spark.sources.io import read_table

            emb = read_table(spark, d, "embeddings")
            return embedding_near_dup_pairs_lsh(
                emb, "vec_id", "embedding", threshold=0.9
            )

        pair_extra = {"embedding_lsh_auto_uncapped": _lsh_auto_probe}
        pair_names = [
            q
            for q in QUERIES_TO_PROBE + list(pair_extra)
            if not args.only or q in args.only.split(",")
        ]
        QUERIES["dedup_clusters"](spark, points[0][1]).count()  # JVM warm
        spark.catalog.clearCache()
        fam = out["families"].get("pair", {**rows, "queries": {}})
        fam.update(rows)
        fam["queries"].update(
            _probe_family(spark, QUERIES, pair_names, pair_extra, points, args.runs)
        )
        out["families"]["pair"] = fam

    if args.family in ("cdm", "all"):
        points = [
            ("x1", build_cdm_scale("cdm_x1", users=1_500, customers=15_000, seed=11), 1),
            ("x10", build_cdm_scale("cdm_x10", users=15_000, customers=150_000, seed=11), 10),
        ]
        rows = {
            "x1_rows": {"events": 100_500, "customers": 15_000, "orders": 150_000},
            "x10_rows": {"events": 1_005_000, "customers": 150_000,
                         "orders": 1_500_000},
        }
        if args.cdm_100x:
            points.append(
                (
                    "x100",
                    build_cdm_scale(
                        "cdm_x100", users=150_000, customers=1_500_000, seed=11
                    ),
                    100,
                )
            )
            rows["x100_rows"] = {
                "events": 10_050_000,
                "customers": 1_500_000,
                "orders": 15_000_000,
            }
        QUERIES["eras"](spark, points[0][1]).count()  # JVM warm
        spark.catalog.clearCache()
        out["families"]["cdm"] = {
            **rows,
            "invariant": "constant per-user/customer depth; constant dims",
            "queries": _probe_family(
                spark,
                QUERIES,
                CDM_QUERIES_TO_PROBE
                + [
                    q
                    for q in EXTRA_PROBES
                    if not args.only or q in args.only.split(",")
                ],
                EXTRA_PROBES,
                points,
                args.runs,
            ),
        }

    if args.family in ("streaming", "all"):
        prior = out["families"].get("streaming", {})
        # seed from prior so tags not probed THIS run (e.g. a recorded
        # x100 point when --streaming-100x is off, or tags outside
        # --only) always carry over instead of silently dropping
        # (ADVICE r8)
        fam: dict = {
            **prior,
            "claim": "per-batch cost flat in stream position; state rows "
            "plateau at keys x horizon depth (watermark+gap bounded), "
            "independent of batches processed",
        }
        stream_points = [("x1", 500), ("x10", 5_000)]
        if args.streaming_100x:
            stream_points.append(("x100", 50_000))
        for tag, users in stream_points:
            if args.only and tag not in args.only.split(","):
                continue
            print(f"streaming {tag}: users={users}", flush=True)
            fam[tag] = probe_streaming(spark, tag, users, seed=23)
            for opname, m in fam[tag].items():
                if isinstance(m, dict):
                    print(
                        f"  {opname:16s} batches={m['n_data_batches']} "
                        f"first/last ms={m['mean_batch_ms_first_fifth']}/"
                        f"{m['mean_batch_ms_last_fifth']} "
                        f"growth={m['batch_ms_growth_ratio']} "
                        f"state peak/final={m['state_rows_peak']}/"
                        f"{m['state_rows_final']}",
                        flush=True,
                    )
        out["families"]["streaming"] = fam

    if args.family == "cdm_deep":
        # third CDM decade for the two highest-exponent queries
        points = [
            (
                "x100",
                build_cdm_scale("cdm_x100", users=150_000, customers=1_500_000, seed=11),
                100,
            ),
            (
                "x1000",
                build_cdm_deep_scale(
                    "cdm_x1000", users=1_500_000, customers=15_000_000, seed=11
                ),
                1000,
            ),
        ]
        deep_names = [
            q
            for q in CDM_QUERIES_TO_PROBE + ["era_ids_distributed"]
            if not args.only or q in args.only.split(",")
        ]
        QUERIES["eras"](spark, points[0][1]).count()  # JVM warm
        spark.catalog.clearCache()
        fam = out["families"].get(
            "cdm_deep",
            {
                "x100_rows": {"events": 10_050_000, "customers": 1_500_000,
                              "orders": 15_000_000},
                "x1000_rows": {"events": 100_500_000, "customers": 15_000_000,
                               "orders": 150_000_000},
                "invariant": "constant per-user/customer depth; constant dims",
                "queries": {},
            },
        )
        fam["queries"].update(
            _probe_family(spark, QUERIES, deep_names, EXTRA_PROBES, points, args.runs)
        )
        out["families"]["cdm_deep"] = fam

    if args.family == "pair_deep":
        # third decade for the pair family's drifting rows (round-8
        # verdict item 4 named three; round 9 added the other two rows
        # whose second-decade exponents had passed 0.7): probe x1000
        # (5M docs) with the per-row-cost regime check the CDM family
        # used (per-doc cost must be non-increasing; wall exponents
        # drift toward 1.0 once 32 threads saturate)
        points = [
            (
                "x100",
                build_scale(
                    "x100", docs=500_000, embs=200_000, names=200_000, seed=7
                ),
                100,
            ),
            ("x1000", build_pair_deep_scale("pair_x1000", docs=5_000_000, seed=7), 1000),
        ]
        deep_names = [
            q
            for q in [
                "quality_classifier",
                "bpe_encode",
                "tfidf_top_terms",
                # round-9 additions: the other two rows whose second-
                # decade exponents drifted past 0.7 (documents-only
                # readers, so the deep corpus suffices)
                "lm_perplexity",
                "corpus_pipeline",
                # round-10 second half: the exact-substring dedup family
                # (documents-only readers; shingle-linear by design)
                "duplicate_spans",
                "line_dedup",
            ]
            if not args.only or q in args.only.split(",")
        ]
        QUERIES["tfidf_top_terms"](spark, points[0][1]).count()  # JVM warm
        spark.catalog.clearCache()
        fam = out["families"].get(
            "pair_deep",
            {
                "x100_rows": {"documents": 500_000},
                "x1000_rows": {"documents": 5_000_000},
                "invariant": "same unigram profile, doc-length bounds, and "
                "20% rolling-window near-copy rate at every scale",
                "queries": {},
            },
        )
        fam["queries"].update(
            _probe_family(spark, QUERIES, deep_names, {}, points, args.runs)
        )
        out["families"]["pair_deep"] = fam

    if args.family == "pair_deep4":
        # FOURTH decade for two flagship pipeline rows (x10000 = 50M
        # docs ≈ 5.6 GB): the regime check at a point where any hidden
        # super-linear term must dominate — per-row cost must stay
        # non-increasing
        points = [
            ("x1000", build_pair_deep_scale("pair_x1000", docs=5_000_000, seed=7), 1000),
            (
                "x10000",
                build_pair_deep_scale("pair_x10000", docs=50_000_000, seed=7),
                10000,
            ),
        ]
        deep_names = [
            q
            for q in ["quality_classifier", "corpus_pipeline"]
            if not args.only or q in args.only.split(",")
        ]
        QUERIES["quality_classifier"](spark, points[0][1]).count()  # JVM warm
        spark.catalog.clearCache()
        fam = out["families"].get(
            "pair_deep4",
            {
                "x1000_rows": {"documents": 5_000_000},
                "x10000_rows": {"documents": 50_000_000},
                "invariant": "same unigram profile, doc-length bounds, and "
                "20% rolling-window near-copy rate at every scale",
                "queries": {},
            },
        )
        fam["queries"].update(
            _probe_family(spark, QUERIES, deep_names, {}, points, args.runs)
        )
        out["families"]["pair_deep4"] = fam

    if args.family == "sim_deep":
        # third decade for the similarity family: the embedding
        # near-dup LSH scale path, the auto-grid ANN search paths, and
        # semantic dedup at 2M vectors.  --sim-10000x adds the FOURTH
        # decade (20M vectors, round-13 verdict item 4 — matching the
        # span/text families' four-decade receipts).  The registry's
        # prover rows run these through capped proof universes, so the
        # probes exercise the production paths directly, uncapped.
        # Builders are LAZY (like the span family) so a --sim-points
        # re-measure of one decade never generates the others' corpora.
        point_defs = [
            ("x100", lambda: build_scale(
                "x100", docs=500_000, embs=200_000, names=200_000, seed=7),
             100),
            ("x1000", lambda: build_sim_deep_scale(
                "sim_x1000", embs=2_000_000, seed=7), 1000),
        ]
        if args.sim_10000x:
            point_defs.append(
                ("x10000", lambda: build_sim_deep_scale(
                    "sim_x10000", embs=20_000_000, seed=7), 10000)
            )
        run_defs = point_defs
        if args.sim_points:
            keep_tags = set(args.sim_points.split(","))
            run_defs = [p for p in point_defs if p[0] in keep_tags]
        points = [(tag, build(), mult) for tag, build, mult in run_defs]

        def _read_emb(spark, d):
            from pedsnetdcc_spark.sources.io import read_table

            return read_table(spark, d, "embeddings")

        def _ann_query_set(emb):
            # fixed 200-query evaluation set, hash-ordered so the same
            # selection rule applies at every scale: wall time then
            # measures (one corpus-sketch scan) + (200 x per-query
            # bucket work) — per-query work must stay bucket-bounded
            # for the exponent to track the scan, not the search
            from pyspark.sql import functions as F

            return emb.orderBy(
                F.xxhash64(F.col("vec_id")), F.col("vec_id")
            ).limit(200)

        def _lsh_near_dup(spark, d):
            from pedsnetdcc_spark.datapipe.similarity import (
                embedding_near_dup_pairs_lsh,
            )

            emb = _read_emb(spark, d)
            return embedding_near_dup_pairs_lsh(
                emb, "vec_id", "embedding", threshold=0.9
            )

        def _ann_lsh(spark, d):
            from pedsnetdcc_spark.datapipe.similarity import lsh_bucketed_topk

            emb = _read_emb(spark, d)
            return lsh_bucketed_topk(emb, _ann_query_set(emb), k=5, dim=64)

        def _ann_ivf(spark, d):
            from pedsnetdcc_spark.datapipe.similarity import ivf_topk

            emb = _read_emb(spark, d)
            # sample_size raised with the corpus per the docstring's
            # >0.5M-vectors guidance (auto caps centroids at 1024, so
            # cells hold ~2k candidates at x1000)
            return ivf_topk(
                emb, _ann_query_set(emb), k=5, nprobe=8, sample_size=8192,
                seed=0,
            )

        def _ann_ivf_hier(spark, d):
            from pedsnetdcc_spark.datapipe.similarity import ivf_topk

            emb = _read_emb(spark, d)
            # the uncapped-codebook path: auto cells track the corpus
            # (2M/512 ≈ 3906 at x1000), two-stage assignment pays
            # O(sqrt(total)) dots/vector, training sample 4x cells
            return ivf_topk(
                emb, _ann_query_set(emb), k=5, nprobe=8, seed=0,
                assign="hierarchical",
            )

        sim_extra = {
            "embedding_lsh_auto_uncapped": _lsh_near_dup,
            "ann_lsh_auto_200q": _ann_lsh,
            "ann_ivf_auto_200q": _ann_ivf,
            "ann_ivf_hier_200q": _ann_ivf_hier,
        }
        sim_names = [
            q
            for q in list(sim_extra) + ["semantic_dedup"]
            if not args.only or q in args.only.split(",")
        ]
        # JVM warm on the small x10 corpus (never a measured decade —
        # warming on points[0] would pre-pay an hour of LSH at x10000)
        warm_dir = build_scale(
            "x10", docs=50_000, embs=20_000, names=20_000, seed=7
        )
        _ann_lsh(spark, warm_dir).count()
        spark.catalog.clearCache()
        fam = out["families"].get(
            "sim_deep",
            {
                "invariant": "64-dim unit gaussians with a 10% "
                "rolling-window near-copy rate at every scale; ANN rows "
                "search a fixed hash-selected 200-query set",
                "queries": {},
            },
        )
        fam.update({
            f"{tag}_rows": {"embeddings": mult * 2_000}
            for tag, _b, mult in point_defs
        })
        # merge this invocation's decades with any already in the
        # output file and recompute exponents over every decade
        # present, exactly as --span-points documents
        _sim_mult = {"x100": 100, "x1000": 1000, "x10000": 10000}
        _sim_order = ["x100", "x1000", "x10000"]
        fresh_entries = _probe_family(
            spark, QUERIES, sim_names, sim_extra, points, args.runs
        )
        for qname, entry in fresh_entries.items():
            old_times = {
                k: v
                for k, v in fam["queries"].get(qname, {}).items()
                if k in _sim_mult
            }
            new_times = {k: v for k, v in entry.items() if k in _sim_mult}
            merged = {**old_times, **new_times}
            ent: dict = {t: merged[t] for t in _sim_order if t in merged}
            have = list(ent)
            for t_a, t_b in zip(have, have[1:]):
                ent[f"exponent_{t_a}_{t_b}"] = round(
                    math.log(merged[t_b] / merged[t_a])
                    / math.log(_sim_mult[t_b] / _sim_mult[t_a]),
                    3,
                )
            if len(have) >= 2:
                ent["exponent"] = round(
                    math.log(merged[have[-1]] / merged[have[0]])
                    / math.log(_sim_mult[have[-1]] / _sim_mult[have[0]]),
                    3,
                )
            fam["queries"][qname] = ent
        out["families"]["sim_deep"] = fam

    if args.family == "media_deep":
        # Third media decade (round-11 verdict item 7): the MIH-mode
        # Hamming band join at 55k -> 550k -> 5.5M signatures.  The
        # corpus is pair-density-CONTROLLED (gen_media_sigs: uniform
        # base + 1/11 planted near-copies at <=2 flips) and the probe
        # runs at max_hamming=2, where MIH uses 2 bands of 32-bit
        # blocks — the regime in which banding stays candidate-sparse
        # (n << 2^32) and the cost is the probe-stream shuffle, which
        # is what the decade's exponent should track.  The max_hamming=6
        # regime (4 x 16-bit blocks) carries an irreducible n^2/2^16
        # incidental-candidate term: ~1.6e10 candidates at 5.5M rows —
        # a cluster-scale job by construction, recorded in SCALE.md as
        # the block-width rule rather than measured locally.  The codec
        # arm (real PNG decode -> dHash) is measured separately on the
        # 550k-image x100 corpus — it is linear and embarrassingly
        # parallel, so the sampled rate extrapolates.
        points = [
            ("s55k", build_media_scale("s55k", sigs=55_000, seed=11), 1),
            ("s550k", build_media_scale("s550k", sigs=550_000, seed=11), 10),
            ("s5500k", build_media_scale("s5500k", sigs=5_500_000, seed=11), 100),
        ]

        def _media_band_join(spark, d):
            from pedsnetdcc_spark.datapipe.dedup import simhash_band_pairs

            sigs = spark.read.parquet(os.path.join(d, "media_sigs.parquet"))
            return simhash_band_pairs(
                sigs, "sid", sig_col="sig", max_hamming=2, probe_radius=1
            )

        media_extra = {"media_mih_band_join_h2": _media_band_join}
        media_names = [
            q for q in media_extra if not args.only or q in args.only.split(",")
        ]
        _media_band_join(spark, points[0][1]).count()  # JVM warm
        spark.catalog.clearCache()
        fam = out["families"].get(
            "media_deep",
            {
                "s55k_rows": 55_000,
                "s550k_rows": 550_000,
                "s5500k_rows": 5_500_000,
                "invariant": "uniform 64-bit signatures + 1/11 planted "
                "near-copies at <=2 bit flips; MIH probe_radius=1, "
                "max_hamming=2 (2 bands x 32-bit blocks) — linear "
                "true-pair regime; the pair-dense real-dHash regime is "
                "output-bound and adjudicated in SCALE.md",
                "queries": {},
            },
        )
        fam["queries"].update(
            _probe_family(
                spark, QUERIES, media_names, media_extra, points, args.runs
            )
        )
        out["families"]["media_deep"] = fam

    if args.family == "span_index":
        # The persisted span-digest index lifecycle at scale (round-11
        # receipts re-runnable + the round-12 fourth decade): build the
        # index on the first 90% of the corpus (doc_id % 10 != 0), then
        # incremental-dedup the held-out 10% generation against it —
        # the FineWeb/Dolma incremental-publish shape.  Decades reuse
        # the pair corpora (identical generator/profile at every
        # scale): 50k -> 500k -> 5M, and 50M with --span-10000x.
        # Build runs ONCE per point (it is the one-time cost the
        # incremental path amortizes); the dedup query runs
        # best-of-`--runs`.  xxh64 digest (production), k=8,
        # min_count=2 — the registry row's parameters.
        import shutil as _sh

        from pyspark.sql import functions as F

        from pedsnetdcc_spark.datapipe.dedup import (
            build_span_index,
            duplicate_spans_against_index,
        )

        # builders are LAZY (called only for decades actually run) so a
        # --span-points re-measure of one decade never generates the
        # other decades' corpora (round-12 review finding)
        decades = [
            ("d50k", lambda: build_scale(
                "x10", docs=50_000, embs=20_000, names=20_000, seed=7), 1),
            ("d500k", lambda: build_scale(
                "x100", docs=500_000, embs=200_000, names=200_000, seed=7),
             10),
            ("d5000k", lambda: build_pair_deep_scale(
                "pair_x1000", docs=5_000_000, seed=7), 100),
        ]
        if args.span_10000x:
            decades.append(
                ("d50000k", lambda: build_pair_deep_scale(
                    "pair_x10000", docs=50_000_000, seed=7), 1000)
            )
        run_points = decades
        if args.span_points:
            keep_tags = set(args.span_points.split(","))
            run_points = [p for p in decades if p[0] in keep_tags]
        only = set(args.only.split(",")) if args.only else None
        build_requested = only is None or "span_index_build_90pct" in only
        dedup_requested = only is None or "span_index_dedup_10pct_new" in only
        if not (build_requested or dedup_requested):
            # a misspelled --only must not generate multi-GB corpora
            # (hours at d50000k) before measuring nothing — skip the
            # decade loop entirely (round-12 ADVICE)
            run_points = []
        build_times: dict[str, float] = {}
        dedup_times: dict[str, float] = {}
        sizes_mb: dict[str, float] = {}
        spans_found: dict[str, int] = {}
        for tag, build_dir, _mult in run_points:
            d = build_dir()
            docs = spark.read.parquet(
                os.path.join(d, "documents.parquet")
            ).select("doc_id", "text")
            old = docs.where(F.col("doc_id") % 10 != 0)
            new = docs.where(F.col("doc_id") % 10 == 0)
            idx = os.path.join(SCALE_DIR, f"span_probe_idx_{tag}")
            if build_requested:
                _sh.rmtree(idx, ignore_errors=True)
                gc.collect()
                t0 = time.time()
                build_span_index(old, idx, "doc_id", k=8, digest="xxh64")
                build_times[tag] = round(time.time() - t0, 3)
                sizes_mb[tag] = round(
                    sum(
                        os.path.getsize(os.path.join(r, f))
                        for r, _dirs, fs in os.walk(idx)
                        for f in fs
                    )
                    / 1e6,
                    1,
                )
            elif dedup_requested and not os.path.exists(
                os.path.join(idx, "meta.json")
            ):
                # dedup-only re-measure needs an index to query; build
                # it UNTIMED as setup (a --only dedup run used to
                # rmtree the index and crash — round-12 review finding)
                build_span_index(old, idx, "doc_id", k=8, digest="xxh64")
            if dedup_requested:
                best = math.inf
                for _ in range(args.runs):
                    gc.collect()
                    t0 = time.time()
                    n = duplicate_spans_against_index(new, idx).count()
                    best = min(best, time.time() - t0)
                    spark.catalog.clearCache()
                dedup_times[tag] = round(best, 3)
                spans_found[tag] = int(n)
            print(
                f"span_index {tag}: build={build_times.get(tag)}s "
                f"dedup={dedup_times.get(tag)}s index={sizes_mb.get(tag)}MB "
                f"spans={spans_found.get(tag)}",
                flush=True,
            )
            _sh.rmtree(idx, ignore_errors=True)

        # canonical decade order/multipliers, independent of which
        # decades THIS invocation ran: exponents recompute over every
        # decade present after the merge, exactly as --span-points
        # documents (round-12 review finding)
        _span_mult = {"d50k": 1, "d500k": 10, "d5000k": 100,
                      "d50000k": 1000}
        _span_order = ["d50k", "d500k", "d5000k", "d50000k"]

        def _entry(times: dict[str, float]) -> dict:
            entry: dict = dict(times)
            have = [t for t in _span_order if t in times]
            for t_a, t_b in zip(have, have[1:]):
                entry[f"exponent_{t_a}_{t_b}"] = round(
                    math.log(times[t_b] / times[t_a])
                    / math.log(_span_mult[t_b] / _span_mult[t_a]),
                    3,
                )
            if len(have) >= 2:
                entry["exponent"] = round(
                    math.log(times[have[-1]] / times[have[0]])
                    / math.log(_span_mult[have[-1]] / _span_mult[have[0]]),
                    3,
                )
            return entry

        fam = out["families"].get(
            "span_index",
            {
                "invariant": "xxh64 digest; k=8; min_count=2; 90/10 "
                "doc_id%10 split; build once, dedup best-of-runs; "
                "equivalence to full-corpus duplicate_spans pinned by "
                "unit test",
                "queries": {},
            },
        )
        fam["decades"] = {
            **fam.get("decades", {}),
            **{tag: mult * 50_000 for tag, _, mult in run_points},
        }
        prev_sizes = fam.get("index_size_mb")
        fam["index_size_mb"] = {
            **(prev_sizes if isinstance(prev_sizes, dict) else {}),
            **sizes_mb,
        }
        prev_spans = fam.get("incremental_spans_found")
        fam["incremental_spans_found"] = {
            **(prev_spans if isinstance(prev_spans, dict) else {}),
            **spans_found,
        }
        for qname, fresh in (
            ("span_index_build_90pct", build_times),
            ("span_index_dedup_10pct_new", dedup_times),
        ):
            if not fresh:
                continue
            merged = {**fam["queries"].get(qname, {}), **fresh}
            fam["queries"][qname] = _entry(
                {t: merged[t] for t in _span_order if t in merged}
            )
        out["families"]["span_index"] = fam

    if args.family == "r10":
        # Round-10 additions: generation diff (slim-signature full-outer
        # join over two derived order generations) and the WebDataset
        # sharded-tar sink/source.  Documents reuse the pair corpora
        # (identical tags/profile); orders grow at constant per-customer
        # depth.
        from pyspark.sql import functions as F

        from pedsnetdcc_spark.operators.diff import diff_tables
        from pedsnetdcc_spark.sources.webdataset import (
            read_webdataset,
            write_webdataset,
        )

        points = [
            ("x1", build_r10_scale("x1", cust=15_000, seed=7), 1),
            ("x10", build_r10_scale("x10", cust=150_000, seed=7), 10),
            ("x100", build_r10_scale("x100", cust=1_500_000, seed=7), 100),
        ]
        docs_dirs = {
            "x1": build_scale("x1", docs=5_000, embs=2_000, names=2_000, seed=7),
            "x10": build_scale("x10", docs=50_000, embs=20_000, names=20_000, seed=7),
            "x100": build_scale("x100", docs=500_000, embs=200_000, names=200_000, seed=7),
        }
        if args.r10_1000x:
            d1k = os.path.join(SCALE_DIR, "r10_x1000")
            os.makedirs(d1k, exist_ok=True)
            marker = os.path.join(d1k, ".complete")
            if not os.path.exists(marker):
                gen_orders_chunked(
                    15_000_000, 10, 8, os.path.join(d1k, "orders.parquet")
                )
                open(marker, "w").close()
            points.append(("x1000", d1k, 1000))
            # documents side: the pair_deep corpus (5M docs)
            docs_dirs["x1000"] = build_pair_deep_scale(
                "pair_x1000", docs=5_000_000, seed=7
            )

        def _docs(spark, d):
            tag = os.path.basename(d).removeprefix("r10_")
            return spark.read.parquet(
                os.path.join(docs_dirs[tag], "documents.parquet")
            ).select(F.col("doc_id").cast("string").alias("doc_id"), "text")

        def _gen_diff(spark, d):
            orders = spark.read.parquet(os.path.join(d, "orders.parquet"))
            old = orders.where(F.col("o_orderkey") % 97 != 0)
            new = orders.where(F.col("o_orderkey") % 93 != 0).select(
                "o_orderkey",
                "o_orderstatus",
                F.when(F.col("o_orderkey") % 91 == 0, F.col("o_totalprice") + 1)
                .otherwise(F.col("o_totalprice"))
                .alias("o_totalprice"),
                F.when(F.col("o_orderkey") % 89 == 0, F.lit(None))
                .otherwise(F.col("o_orderpriority"))
                .alias("o_orderpriority"),
            )
            return diff_tables(new, old, ["o_orderkey"])

        def _wds_export(spark, d):
            import shutil
            import tempfile

            tmp = tempfile.mkdtemp(prefix="wds_probe_")
            m = write_webdataset(
                _docs(spark, d), tmp, key_col="doc_id",
                members={"txt": "text"}, shards=32,
            )
            shutil.rmtree(tmp, ignore_errors=True)
            return spark.createDataFrame(
                [(r["shard"], r["samples"]) for r in m],
                "shard string, samples long",
            )

        # staged export per point (once; the read probe reuses it)
        for _tag, d, _m in points:
            wdir = os.path.join(d, "wds")
            if not os.path.exists(os.path.join(wdir, "manifest.jsonl")):
                write_webdataset(
                    _docs(spark, d), wdir, key_col="doc_id",
                    members={"txt": "text"}, shards=32, mode="overwrite",
                )

        def _wds_read(spark, d):
            return read_webdataset(
                spark, os.path.join(d, "wds"), members={"txt": "text"},
                text_exts={"txt"},
            )

        # persistent IVF index: embeddings ride in the pair corpora
        # (2k/20k/200k) and the sim_deep corpus at x1000 (2M)
        from pedsnetdcc_spark.datapipe.similarity import (
            build_ivf_index,
            open_ivf_index,
        )

        emb_dirs = dict(docs_dirs)
        if args.r10_1000x:
            emb_dirs["x1000"] = build_sim_deep_scale(
                "sim_x1000", embs=2_000_000, seed=7
            )

        def _emb(spark, d):
            tag = os.path.basename(d).removeprefix("r10_")
            return spark.read.parquet(
                os.path.join(emb_dirs[tag], "embeddings.parquet")
            )

        def _ivf_build(spark, d):
            import shutil
            import tempfile

            tmp = tempfile.mkdtemp(prefix="ivf_probe_")
            meta = build_ivf_index(_emb(spark, d), tmp, seed=7)
            shutil.rmtree(tmp, ignore_errors=True)
            return spark.createDataFrame(
                [(meta["n_centroids"],)], "n_centroids int"
            )

        # staged index per point (once; the query probe reuses it)
        for _tag, d, _m in points:
            idx = os.path.join(d, "ivf_idx")
            if not os.path.exists(os.path.join(idx, "meta.json")):
                build_ivf_index(_emb(spark, d), idx, seed=7)

        # query sets PRE-COLLECTED per point: selecting queries scans
        # the corpus, which would otherwise dominate the timed region
        # and mask the pruned read the probe exists to measure
        qsets: dict[str, list] = {}
        for tag, d, _m in points:
            rows = (
                _emb(spark, d)
                .withColumn("__h", F.xxhash64("vec_id", F.lit(11)))
                .orderBy("__h")
                .limit(200)
                .collect()
            )
            qsets[tag] = [
                (r["vec_id"], [float(x) for x in r["embedding"]]) for r in rows
            ]

        # the serving pattern: index HANDLES opened once per point
        # (codebook + ONE cell-directory listing) outside the timed
        # region — the listing is the dominant one-shot cost at large
        # cell counts (measured: 5.5 s of the 8 s one-shot at 3,906
        # cells) and a query service pays it once, not per batch
        handles = {
            tag: open_ivf_index(spark, os.path.join(d, "ivf_idx"))
            for tag, d, _m in points
        }

        def _ivf_query_n(nq: int):
            # fixed nq-query batch.  Per-batch scan is bounded by the
            # DISTINCT probed cells (≤ nq × nprobe), so the pruning
            # receipt appears once cells ≫ nq×nprobe: the large batch
            # amortizes toward a full corpus read (every cell probed at
            # small scale), the small batch flattens as the corpus
            # grows past it.
            def fn(spark, d):
                tag = os.path.basename(d).removeprefix("r10_")
                q = spark.createDataFrame(
                    qsets[tag][:nq], "vec_id long, embedding array<double>"
                )
                return handles[tag].query(q, k=5, nprobe=8)

            return fn

        r10_extra = {
            "generation_diff_op": _gen_diff,
            "wds_export": _wds_export,
            "wds_read": _wds_read,
            "ivf_index_build": _ivf_build,
            "ivf_index_query_200q": _ivf_query_n(200),
            "ivf_index_query_20q": _ivf_query_n(20),
        }
        r10_names = [
            q for q in r10_extra
            if not args.only or q in args.only.split(",")
        ]
        fam = out["families"].get(
            "r10",
            {
                "x1_rows": {"orders": 150_000, "documents": 5_000},
                "x10_rows": {"orders": 1_500_000, "documents": 50_000},
                "x100_rows": {"orders": 15_000_000, "documents": 500_000},
                "invariant": "orders at constant per-customer depth with "
                "the generation_diff %-rules (changed/added/removed "
                "fractions constant across scales); documents = the pair "
                "family corpora; WebDataset export/read at 32 shards",
                "queries": {},
            },
        )
        if args.r10_1000x:
            fam["x1000_rows"] = {"orders": 150_000_000, "documents": 5_000_000}
        fam["queries"].update(
            _probe_family(spark, QUERIES, r10_names, r10_extra, points, args.runs)
        )
        out["families"]["r10"] = fam

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
