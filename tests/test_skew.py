"""Skew-path proof: the two remedies for a hot join key actually engage.

A surrogate-key remap join (operators/ids.remap_keys) shuffles on the
key; one hot key (a mega-site's person_id, a null-sentinel concept)
lands an entire shuffle partition on one task.  Two mitigations exist:

- ``util.salted_join`` — manual salting for joins AQE cannot split;
- AQE's skew-join split (enabled in build_session) — runtime partition
  splitting for sort-merge joins.

These tests pin both: salting preserves results while provably spreading
the hot key across partitions, and AQE marks the skewed sort-merge join
``isSkew=true`` at runtime under skew-sized thresholds.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pedsnetdcc_spark.util import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of 40k fact rows share key 1; dimension has 100 keys."""
    fact = spark.range(40_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1))
        .otherwise(F.col("id") % 100)
        .alias("site_id"),
        F.col("id").alias("row_id"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("site_id"), (F.col("id") + 1000).alias("dcc_id")
    )
    return fact, dim


def test_salted_join_preserves_results(spark, skewed):
    fact, dim = skewed
    plain = fact.join(dim, "site_id").select("row_id", "dcc_id")
    salted = salted_join(fact, dim, "site_id").select("row_id", "dcc_id")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salting_spreads_the_hot_key(spark, skewed):
    """The mechanism itself: partitioning on the bare key puts the hot
    key's ~36k rows in ONE partition; partitioning on (key, salt)
    bounds every partition near 1/salt of that."""
    fact, _ = skewed
    n_parts = 8
    salt = 8

    bare = fact.repartition(n_parts, F.col("site_id"))
    bare_max = max(
        r["cnt"]
        for r in bare.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    assert bare_max >= 36_000  # the hot key is one indivisible partition

    salted = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt))
    ).repartition(n_parts * salt, F.col("site_id"), F.col("__salt"))
    salted_max = max(
        r["cnt"]
        for r in salted.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    # hot key split across `salt` buckets: no partition holds more than
    # ~1/salt of it (2x headroom for hash co-location noise)
    assert salted_max <= 36_000 * 2 // salt, (bare_max, salted_max)


def test_aqe_splits_skewed_remap_join(spark, skewed):
    """Under skew-sized thresholds AQE must mark the remap join's hot
    partition ``isSkew=true`` — the runtime half of the scale posture
    that build_session only asserts by configuration."""
    fact, dim = skewed
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    try:
        # shrink thresholds so the 36k-row hot partition counts as skewed
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

        from pedsnetdcc_spark.operators.ids import remap_keys

        remapped = remap_keys(fact, dim, "site_id")
        # materialize THIS DataFrame's own query execution (count() would
        # plan a separate aggregate query and leave this one unfinalized)
        remapped.collect()
        plan = remapped._jdf.queryExecution().executedPlan().toString()
        assert "isSkew=true" in plan or "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
