"""JDBC source/sink — the reference's Postgres data plane (S1).

All reference reads/writes go through psycopg2 connections built from a
libpq conn string (reference: pedsnetdcc/db.py:120-246; conn-string
parsing in utils.py:82-148).  In Spark the same deployment shape is
``spark.read.jdbc`` with partitioned reads; the adapter is exercised
against a LIVE JDBC database in tests (embedded Derby, which ships in
Spark's jars) — round-trip write → single read → partitioned read
(tests/test_jdbc.py).  Postgres differs only in URL/driver string.

Scale: always pass ``partition_column/num_partitions`` bounds for big
tables — an unpartitioned JDBC read is a single connection pulling the
whole table through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def make_jdbc_url(host: str, dbname: str, port: int = 5432) -> str:
    """The ``make_conn_str`` analog (utils.py:82-148) for JDBC."""
    return f"jdbc:postgresql://{host}:{port}/{dbname}"


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    user: str,
    password: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    driver: str | None = None,
) -> DataFrame:
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
    )
    if driver is not None:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()


def write_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
    mode: str = "append",
    driver: str | None = None,
) -> None:
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
    )
    if driver is not None:
        writer = writer.option("driver", driver)
    writer.mode(mode).save()
