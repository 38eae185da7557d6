"""Bucketed catalog tables — co-located joins without a shuffle.

The reference tunes Postgres point lookups with per-column indexes
(reference: pedsnetdcc/indexes.py; SURVEY.md §4 maps these to
clustering advice, not Spark features).  For the joins the engine runs
repeatedly — fact tables against their surrogate-id map on the same key
every data cycle (id_mapping_transform.py's per-table remaps) — the
Spark-native answer is bucketing: write both sides
``bucketBy(n, key)`` so subsequent equi-joins on that key read
pre-partitioned data and skip the exchange entirely.

``write_bucketed`` + ``bucketed_join`` package that pattern; the test
asserts the physical plan contains NO shuffle exchange on the join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | Sequence[str],
    num_buckets: int = 32,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Materialize as a bucketed (and optionally sorted) catalog table —
    bucket count should match the downstream join parallelism.  ``key``
    may be one column or a composite key list.  With ``path`` the table
    is EXTERNAL: data lives in the namespace directory (atomic-publish
    friendly), only metadata sits in the catalog.

    Bucket-count sizing at scale: one bucket of the LARGER side should
    be ~128 MB-1 GB (100 TB / 100k buckets ≈ 1 GB); both sides must use
    the same count and key for the co-located, exchange-free plan."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: with matching
    bucket counts Spark plans a sort-merge join with NO exchange on
    either side."""
    keys = [key] if isinstance(key, str) else list(key)
    return spark.table(left_table).join(spark.table(right_table), keys, how)
