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
