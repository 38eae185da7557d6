"""CSV-driven external-id mapping — the ``map_external_ids`` analog.

The reference reads a CSV of external (site) ids, assigns new surrogate
ids from the allocator for ids not yet mapped, inserts the pairs in
100k-value batches, and writes the resulting mapping back out as CSV
(reference: pedsnetdcc/external_id_mapper.py:48-155 flow, 63-66 CSV in,
137-146 CSV out, 199-207 batching).

Spark shape: ``spark.read.csv`` → left-anti vs existing map →
contiguous assignment (operators/ids.py) → ``df.write.csv``.  The
batching knob disappears: partitioned writes are the batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pedsnetdcc_spark.operators.ids import IdAllocator, build_id_map


def read_external_ids(spark: SparkSession, path: str, id_col: str) -> DataFrame:
    return (
        spark.read.option("header", "true")
        .csv(path)
        .select(F.col(id_col).alias("site_id"))
    )


def map_external_ids(
    spark: SparkSession,
    csv_in: str,
    csv_out: str,
    id_col: str,
    allocator: IdAllocator,
    name: str,
    existing_map: DataFrame | None = None,
    mode: str = "window",
) -> DataFrame:
    """Read external ids, extend the map, write ``(site_id, dcc_id)``
    CSV; returns the full updated map."""
    ids = read_external_ids(spark, csv_in, id_col)
    id_map = build_id_map(ids, existing_map, "site_id", allocator, name, mode=mode)
    id_map.write.mode("overwrite").option("header", "true").csv(csv_out)
    return id_map
