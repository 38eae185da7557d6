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

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Materialize as a bucketed (and optionally sorted) catalog table —
    bucket count should match the downstream join parallelism."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: with matching
    bucket counts Spark plans a sort-merge join with NO exchange on
    either side."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
