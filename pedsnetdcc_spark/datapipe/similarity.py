"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk`` — exact brute-force: broadcast the (small) query set
  against all candidates; dot products via ``F.zip_with`` +
  ``F.aggregate`` (JVM-side, no UDF).  The per-query top-k uses a
  window over similarity with deterministic tie-breaking.  This is the
  baseline/verifier.
- ``lsh_bucketed_topk`` — the scale path: deterministic random-
  hyperplane LSH (sign sketch built from seeded xxhash64 projections of
  the dimension index — no RNG state) buckets candidates; each query
  probes only its bucket (plus optional Hamming-1 neighbor buckets),
  turning the n×m cross product into bucket-local joins.  Recall is
  tunable via bits/probes; verified against ``cosine_topk`` in tests.

At 100 TB-scale embedding tables the brute-force path still distributes
(the cross join is per-partition with the queries broadcast), but the
LSH path bounds per-query work; an IVF variant would replace the
hash buckets with k-means centroids (same join shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors per query: ``(query_id, rank,
    neighbor_id, cosine)``; ties broken by neighbor id ascending.

    Cast to double before the fold so accumulation is in float64 on
    every engine.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    )
    pairs = c.crossJoin(F.broadcast(q))
    if not include_self:
        pairs = pairs.where(F.col("neighbor_id") != F.col("query_id"))
    sims = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("__qv"), F.col("__cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def hyperplane_sketch(vec: Column, bits: int = 8, seed: int = 0) -> Column:
    """Deterministic sign sketch: bit i = sign of Σ_j s(i,j)·v[j] with
    s(i,j) ∈ {−1, +1} derived from xxhash64(seed, i, j) — a seeded
    random-hyperplane projection with no RNG state, reproducible across
    runs and engines."""
    sig = None
    for i in range(bits):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.transform(F.sequence(F.lit(0), F.size(vec) - 1), lambda j: j),
                lambda v, j: F.when(
                    F.xxhash64(F.lit(seed * 1024 + i), j).bitwiseAND(F.lit(1)) == 1, v
                ).otherwise(-v),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseOR(term)
    return sig


def lsh_bucketed_topk(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bits: int = 4,
    tables: int = 8,
    probe_hamming1: bool = True,
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH: ``tables``
    independent sketches of ``bits`` bits each; a candidate is scored if
    it shares any table's bucket with the query (plus Hamming-1 probes).

    Recall ≈ 1 − (1 − p^bits)^tables with p = 1 − θ/π per bit — tune
    tables up / bits down for higher recall at more comparisons.  The
    candidate set stays bucket-local, so per-query work is bounded by
    bucket sizes, not the corpus.
    """
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    c_tagged = []
    q_tagged = []
    for t in range(tables):
        sk_c = hyperplane_sketch(F.col("__cv"), bits, seed=t)
        sk_q = hyperplane_sketch(F.col("__qv"), bits, seed=t)
        c_tagged.append(
            c.select("neighbor_id", "__cv", F.lit(t).alias("tbl"), sk_c.alias("bucket"))
        )
        if probe_hamming1:
            probes = F.array(sk_q, *[sk_q.bitwiseXOR(F.lit(1 << i)) for i in range(bits)])
        else:
            probes = F.array(sk_q)
        q_tagged.append(
            q.select(
                "query_id",
                "__qv",
                F.lit(t).alias("tbl"),
                F.explode(probes).alias("bucket"),
            )
        )
    c_all = c_tagged[0]
    for x in c_tagged[1:]:
        c_all = c_all.unionByName(x)
    q_all = q_tagged[0]
    for x in q_tagged[1:]:
        q_all = q_all.unionByName(x)
    pairs = c_all.join(F.broadcast(q_all), ["tbl", "bucket"]).where(
        F.col("neighbor_id") != F.col("query_id")
    )
    sims = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("__qv"), F.col("__cv")).alias("cosine"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
