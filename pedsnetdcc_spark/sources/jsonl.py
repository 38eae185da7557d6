"""JSONL corpus source/sink — the interchange format of public LLM
data pipelines (one JSON object per line, gzip/zstd-compressed shards).

The reference's external interchange is CSV (external_id_mapper.py) and
pg_dump; a training-data engine additionally needs JSONL because every
public corpus release (C4, The Pile, RefinedWeb, Dolma) ships that way.
Spark's native json source handles it distributedly — a directory of
``*.jsonl`` / ``*.jsonl.gz`` shards scans as one DataFrame, one task
per shard (gzip shards are unsplittable, so shard count = read
parallelism; zstd/uncompressed split normally).

Schema is ALWAYS supplied explicitly: schema inference runs an extra
full pass over the data at plan time (a doubled multi-hour scan at
100 TB) and silently widens types on dirty corpora.  Unknown keys are
preserved or rejected via ``mode``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """Read a JSONL corpus under an explicit schema.

    ``mode``: Spark's json parse modes — ``PERMISSIVE`` (malformed
    lines become all-null rows, captured in ``corrupt_col`` when
    given), ``DROPMALFORMED`` (silently dropped), ``FAILFAST`` (abort
    on first bad line).  For a quarantine pipeline pass
    ``corrupt_col="_corrupt_record"`` and route those rows aside.
    """
    if corrupt_col:
        from pyspark.sql.types import StringType

        schema = schema.add(corrupt_col, StringType())
    reader = spark.read.schema(schema).option("mode", mode)
    if corrupt_col:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str = "gzip",
    shards: int | None = None,
    order_col: str | None = None,
) -> None:
    """Write a corpus as JSONL shards.

    ``shards`` repartitions before the write (shard count = downstream
    read parallelism for gzip); ``order_col`` sorts WITHIN each shard
    (``sortWithinPartitions`` — a local sort, no global exchange) so a
    packed/shuffled corpus streams in delivery order shard by shard.
    """
    if shards is not None:
        df = df.repartition(shards)
    if order_col is not None:
        df = df.sortWithinPartitions(order_col)
    df.write.mode("overwrite").option("compression", compression).json(path)


def jsonl_roundtrip_check(
    spark: SparkSession, df: DataFrame, path: str, id_col: str
) -> bool:
    """Write + re-read + anti-join both ways: True iff the roundtrip
    preserved every row (content-exact on the shared schema)."""
    write_jsonl(df, path)
    back = read_jsonl(spark, path, df.schema)
    a = df.join(back, [id_col], "left_anti").count()
    b = back.join(df, [id_col], "left_anti").count()
    return a == 0 and b == 0 and back.count() == df.count()
