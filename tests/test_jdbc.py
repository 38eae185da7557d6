"""JDBC source/sink against a LIVE database: embedded Derby (shipped in
Spark's jars) running in the test JVM — a real JDBC endpoint with DDL,
types, and a network-free lifecycle.  Pins the S1 adapter
(sources/jdbc.py) end to end: write → read → partitioned read.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pedsnetdcc_spark.sources.jdbc import read_jdbc_table, write_jdbc_table

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url():
    d = tempfile.mkdtemp()
    yield f"jdbc:derby:{d}/db;create=true"
    shutil.rmtree(d, ignore_errors=True)


def test_jdbc_roundtrip_and_partitioned_read(spark, derby_url):
    src = spark.createDataFrame(
        [(i, f"name_{i}", float(i) * 1.5) for i in range(100)],
        "id long, name string, val double",
    )
    write_jdbc_table(
        src, derby_url, "t_round", user="app", password="x",
        mode="overwrite", driver=DERBY_DRIVER,
    )
    back = read_jdbc_table(
        spark, derby_url, "t_round", user="app", password="x", driver=DERBY_DRIVER
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))

    # partitioned read: 4 parallel range-partitioned connections
    part = read_jdbc_table(
        spark, derby_url, "t_round", user="app", password="x",
        partition_column="id", lower_bound=0, upper_bound=100,
        num_partitions=4, driver=DERBY_DRIVER,
    )
    assert part.rdd.getNumPartitions() == 4
    assert sorted(map(tuple, part.collect())) == sorted(map(tuple, src.collect()))


def test_jdbc_append_mode(spark, derby_url):
    a = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    b = spark.createDataFrame([(3, "c")], "id long, s string")
    write_jdbc_table(a, derby_url, "t_app", "app", "x", mode="overwrite", driver=DERBY_DRIVER)
    write_jdbc_table(b, derby_url, "t_app", "app", "x", mode="append", driver=DERBY_DRIVER)
    back = read_jdbc_table(spark, derby_url, "t_app", "app", "x", driver=DERBY_DRIVER)
    assert sorted(map(tuple, back.collect())) == [(1, "a"), (2, "b"), (3, "c")]
