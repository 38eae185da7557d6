"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition when the input arrives with fewer partitions than the
    cluster has slots — a small parquet file scans as ONE split, which
    serializes every CPU-bound per-row stage after it.  At real scale
    the scan already has ≥ slots splits and this is a no-op (the check
    is plan-side only; no job runs)."""
    par = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def salted_join(
    left: "DataFrame",
    right: "DataFrame",
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> "DataFrame":
    """Skew-mitigating equi-join: salt the (skewed) left side's key with
    a deterministic bucket derived from the whole row hash, replicate
    the right side ``salt``× — the classic manual remedy when one hot
    key overwhelms a single shuffle partition.  AQE's skew-join split
    (enabled in build_session) handles most cases automatically; this
    operator covers engines/joins AQE can't split (e.g. bucketed-table
    joins, or pre-AQE deployments).

    Semantics-preserving for inner/left joins on an equi-key.
    """
    from pyspark.sql import functions as F

    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l = left.withColumn("__salt", lsalt)
    r = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    out = l.join(r, [key, "__salt"], how)
    return out.drop("__salt")
