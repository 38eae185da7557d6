"""Generic columnar/text interchange: one export/import surface over
Spark's built-in sources (parquet, orc, csv, json/jsonl).

The reference's interchange surface is CSV (external_id_mapper.py:63-66,
137-146) and pg_dump archives (id_maps.py:88-167); a lake-side engine
standardizes on *directories of format shards* instead, and which
format depends on the consumer: parquet (default, predicate-pushdown +
column pruning), ORC (other-warehouse interchange — Hive/Trino
ecosystems), CSV (spreadsheet/Postgres COPY interchange), JSONL (public
corpus releases — see sources/jsonl.py for the quarantine-aware corpus
path).

Explicit schemas on import for the text formats: schema inference costs
a second full pass at plan time and silently widens types; columnar
formats carry their own schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_FORMATS = ("parquet", "orc", "csv", "json")


def export_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
    header: bool = True,
) -> None:
    """Write ``df`` as a directory of ``fmt`` shards.  Shard count =
    ``df`` partitioning (repartition first to choose shard size; the
    100 TB rule of thumb is 128 MB-1 GB per shard so the re-read gets
    one task per shard without a small-files explosion)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unknown format {fmt!r}; one of {_FORMATS}")
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if compression:
        w = w.option("compression", compression)
    if fmt == "csv":
        w = w.option("header", str(header).lower())
    w.format(fmt).save(path)


def import_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
    header: bool = True,
) -> DataFrame:
    """Read a directory of ``fmt`` shards.  ``schema`` is REQUIRED for
    csv/json (inference re-scans the data and widens dirty columns);
    parquet/ORC carry their own."""
    if fmt not in _FORMATS:
        raise ValueError(f"unknown format {fmt!r}; one of {_FORMATS}")
    r = spark.read
    if fmt in ("csv", "json"):
        if schema is None:
            raise ValueError(f"{fmt} import requires an explicit schema")
        r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", str(header).lower())
    return r.format(fmt).load(path)
