"""In-Spark agreement scoring: production approximate operators vs their
exact twins.

The production dedup/ANN paths hash with ``xxhash64`` or batch float
matmuls — families an external SQL oracle cannot replay bit-for-bit.
Their *quality contract* is still fully checkable: run the production
operator AND its exact, independently-oracle-checked twin in the same
job and score the agreement — every metric below is a deterministic
function of the data (seeded hashes, no RNG), so the scores are stable
query results, not statistics.

Three invariants are emitted:

- **exact-side cardinality** (``n_exact`` / ``n_queries``): recomputed
  by the SQL oracle from the raw tables, so the exact twin inside the
  job must agree with an external engine;
- **zero false positives** (``false_positives = 0``): candidate paths
  verify with the same exact measure the twin uses (identical shingle
  sets / cosine), so every emitted pair MUST be in the exact result —
  this checks verification correctness, not luck;
- **bounded recall** (``recall_ok``): the candidate generation finds at
  least the documented fraction of the exact result at the operator's
  production parameters.

Plan shape: each scorer is ONE full-outer join of the two (small) result
sets followed by one aggregate — every expensive upstream pipeline is
referenced exactly once, so nothing is recomputed per scoring branch and
no cache is needed.  Nothing is collected on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tagged_outer(
    left: DataFrame, right: DataFrame, keys: list[str]
) -> DataFrame:
    """Full-outer join of two key sets with presence flags ``__l``/``__r``
    — the single pass every scorer below aggregates over."""
    l = left.select(*keys).withColumn("__l", F.lit(1))
    r = right.select(*keys).withColumn("__r", F.lit(1))
    return l.join(r, keys, "full_outer")


def pair_set_agreement(
    prod_pairs: DataFrame,
    exact_pairs: DataFrame,
    min_recall_pct: int,
    keys: tuple[str, str] = ("id_a", "id_b"),
) -> DataFrame:
    """Score a production near-dup pair set against the exact pair set.

    Returns ONE row ``(n_exact, false_positives, recall_ok)``:
    ``n_exact`` = |exact|, ``false_positives`` = |prod \\ exact| (must
    be 0 when the production path exact-verifies its candidates), and
    ``recall_ok`` = |prod ∩ exact| * 100 ≥ min_recall_pct * |exact|.
    """
    both = _tagged_outer(prod_pairs, exact_pairs, list(keys))
    return both.agg(
        F.count("__r").alias("n_exact"),
        F.count(F.when(F.col("__r").isNull(), 1)).alias("false_positives"),
        (
            F.count(F.when(F.col("__l").isNotNull() & F.col("__r").isNotNull(), 1))
            * 100
            >= F.lit(min_recall_pct) * F.count("__r")
        ).alias("recall_ok"),
    )


def topk_recall_per_query(
    prod_topk: DataFrame,
    exact_topk: DataFrame,
    min_common: int,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """Per-query recall scorecard for an approximate top-k against the
    exact top-k: one row per query ``(query_id, k_returned, recall_ok)``
    where ``k_returned`` counts the production rows and ``recall_ok``
    asserts ≥ ``min_common`` of the exact top-k neighbors were found."""
    both = _tagged_outer(prod_topk, exact_topk, [query_col, neighbor_col])
    return both.groupBy(query_col).agg(
        F.count("__l").alias("k_returned"),
        (
            F.count(F.when(F.col("__l").isNotNull() & F.col("__r").isNotNull(), 1))
            >= F.lit(min_common)
        ).alias("recall_ok"),
    )


def topk_recall_total(
    prod_topk: DataFrame,
    exact_topk: DataFrame,
    min_recall_pct: int,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """Aggregate recall scorecard: ONE row ``(n_queries, n_exact,
    k_complete, recall_ok)`` — the production side returned as many rows
    as the exact side in total (``k_complete``) and the TOTAL fraction
    of exact neighbors recovered meets ``min_recall_pct``."""
    both = _tagged_outer(prod_topk, exact_topk, [query_col, neighbor_col])
    return both.agg(
        F.count_distinct(F.when(F.col("__r").isNotNull(), F.col(query_col))).alias(
            "n_queries"
        ),
        F.count("__r").alias("n_exact"),
        (F.count("__l") == F.count("__r")).alias("k_complete"),
        (
            F.count(F.when(F.col("__l").isNotNull() & F.col("__r").isNotNull(), 1))
            * 100
            >= F.lit(min_recall_pct) * F.count("__r")
        ).alias("recall_ok"),
    )


def signature_locality(
    signatures: DataFrame,
    dup_pairs: DataFrame,
    corpus_count: DataFrame,
    max_hamming: int,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
) -> DataFrame:
    """Score a SimHash signature table against exact near-duplicate
    pairs: ONE row ``(n_docs, n_sigs, dup_pairs, dup_pairs_close)`` —
    one signature per (tokenizable) document and EVERY exact near-dup
    pair within ``max_hamming`` bits (the locality property that makes
    the signature useful).  ``corpus_count`` is a 1-row ``(n_docs)``
    aggregate over the raw corpus, giving the oracle its anchor.

    The signature table feeds three branches (two pair sides + the
    count), so it is cached — one signature computation, not three."""
    from pedsnetdcc_spark.datapipe.dedup import hamming64

    signatures = signatures.cache()
    sa = signatures.select(
        F.col(id_col).alias("id_a"), F.col(sig_col).alias("__ha")
    )
    sb = signatures.select(
        F.col(id_col).alias("id_b"), F.col(sig_col).alias("__hb")
    )
    scored = (
        dup_pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(hamming64(F.col("__ha"), F.col("__hb")).alias("__d"))
        .agg(
            F.count(F.lit(1)).alias("dup_pairs"),
            F.coalesce(F.max("__d"), F.lit(0)).alias("__max_d"),
        )
    )
    sig_n = signatures.agg(F.count(F.lit(1)).alias("n_sigs"))
    return corpus_count.crossJoin(sig_n).crossJoin(scored).select(
        "n_docs",
        "n_sigs",
        "dup_pairs",
        (F.col("__max_d") <= F.lit(max_hamming)).alias("dup_pairs_close"),
    )


def pair_sets_equal(
    left: DataFrame,
    right: DataFrame,
    corpus_count: DataFrame,
    keys: tuple[str, str] = ("id_a", "id_b"),
) -> DataFrame:
    """Prove two pair sets identical: ONE row ``(n_docs, missing,
    extra)`` where ``missing`` = |right \\ left| and ``extra`` =
    |left \\ right| must both be 0.  ``corpus_count`` is a 1-row
    ``(n_docs)`` aggregate giving the oracle a data-dependent anchor."""
    both = _tagged_outer(left, right, list(keys))
    diff = both.agg(
        F.count(F.when(F.col("__l").isNull(), 1)).alias("missing"),
        F.count(F.when(F.col("__r").isNull(), 1)).alias("extra"),
    )
    return corpus_count.crossJoin(diff)
