"""Partition-layout invariance: operators whose output involves windows,
ranks, or distributed id assignment must return IDENTICAL rows whatever
the physical layout of their inputs — ties that silently depend on
partitioning become nondeterministic results on a real cluster, where
layout varies run to run.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pedsnetdcc_spark.sources.io import read_table


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("parts", [3, 17])
def test_derive_eras_layout_invariant(spark, sf_dir, parts):
    from pedsnetdcc_spark.operators.eras import derive_eras

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    base = derive_eras(ev, ["user_id"], "d", F.col("d"), gap_days=5)
    shuffled = derive_eras(
        ev.repartition(parts), ["user_id"], "d", F.col("d"), gap_days=5
    )
    assert _rows(base) == _rows(shuffled)


@pytest.mark.parametrize("parts", [3, 17])
def test_cosine_topk_layout_invariant(spark, sf_dir, parts):
    """rank ties break on neighbor_id, so the top-k set must not move
    with candidate layout."""
    from pedsnetdcc_spark.datapipe.similarity import cosine_topk

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    assert _rows(cosine_topk(emb, q, k=3)) == _rows(
        cosine_topk(emb.repartition(parts), q, k=3)
    )


def test_distributed_id_assignment_layout_invariant(spark, sf_dir):
    """The two-phase distributed id mode orders by key before the
    per-partition prefix sums — ids must match across layouts."""
    from pedsnetdcc_spark.operators.ids import assign_surrogate_ids

    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    a = assign_surrogate_ids(cust, "sid", "c_custkey", base=100, mode="distributed")
    b = assign_surrogate_ids(
        cust.repartition(11), "sid", "c_custkey", base=100, mode="distributed"
    )
    assert _rows(a) == _rows(b)


def test_simhash_layout_invariant(spark, sf_dir):
    from pedsnetdcc_spark.datapipe.dedup import simhash64

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    assert _rows(simhash64(docs, "doc_id", "text")) == _rows(
        simhash64(docs.repartition(9), "doc_id", "text")
    )


@pytest.mark.parametrize("parts", [3, 17])
def test_embedding_near_dup_lsh_layout_invariant(spark, sf_dir, parts):
    """Sketches are per-row functions of the vector (closure-broadcast
    planes), so the candidate/verified pair set must not move with the
    corpus layout."""
    from pedsnetdcc_spark.datapipe.similarity import embedding_near_dup_pairs_lsh

    emb = read_table(spark, sf_dir, "embeddings")
    base = embedding_near_dup_pairs_lsh(emb, threshold=0.45, bits=3, tables=10)
    shuffled = embedding_near_dup_pairs_lsh(
        emb.repartition(parts), threshold=0.45, bits=3, tables=10
    )
    assert _rows(base) == _rows(shuffled)
