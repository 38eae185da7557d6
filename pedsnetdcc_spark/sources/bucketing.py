"""Bucketed table layout — co-located joins without a shuffle.

The reference tunes Postgres point-lookup performance with per-column
indexes (reference: pedsnetdcc/indexes.py:54-86); the lake-side levers
are (a) range-clustered files for row-group pruning
(sources/clustering.py) and (b) HASH BUCKETING, which this module adds:
write both sides of a recurring big-big join bucketed by the join key
into the same bucket count, and Spark's bucketed scan joins them with
NO Exchange on either side — the single biggest shuffle saving
available for the engine's recurring key joins (fact ⋈ id-map,
fact ⋈ fact on person_id) at 100 TB, where one avoided shuffle is tens
of terabytes of network.

Bucket-count guidance: pick `buckets` so one bucket of the LARGER table
is ~128 MB-1 GB (e.g. 100 TB / 100k buckets ≈ 1 GB); both sides must
use the SAME count and key for the co-located plan.  `sortBy` the join
key too and the SortMergeJoin's per-bucket sort disappears as well.

Tables are written as EXTERNAL tables (explicit ``path``) registered in
the session catalog — metadata lives with the catalog (in-memory here,
a metastore in production), data stays in the namespace directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    path: str,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` hash-bucketed by ``bucket_cols`` into
    ``num_buckets`` files per write-task group, registered as external
    table ``table`` at ``path``."""
    w = (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key.  When
    both were written with :func:`write_bucketed` using the same key
    and bucket count, the physical plan contains no Exchange (asserted
    in tests) — each task reads bucket i from both sides."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
