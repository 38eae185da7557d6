"""SparkSession construction tuned for the engine.

The reference parallelizes work with a pool of 25 database connections
(reference: pedsnetdcc/db.py:314-320); in Spark the scheduler plays that
role, so the session here concentrates on the knobs that matter at scale:
AQE (runtime re-planning, skew-join splitting, partition coalescing),
shuffle partition count, broadcast threshold, and Arrow for the few
Pandas-UDF code paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the dev harness (single JVM, local[N]); on a real
# cluster the same builder is used with master/memory supplied by the
# submitter and shuffle partitions sized to ~2-3x total executor cores.
DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_session(
    app_name: str = "pedsnetdcc_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config.

    Scale posture: AQE enabled so runtime statistics re-plan joins
    (broadcast conversion, skew split) after each shuffle; partition
    coalescing keeps small-SF test runs from drowning in empty tasks
    while leaving large runs at the configured parallelism.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE can only COALESCE shuffle partitions, never split them, so
        # the initial partition count is the hard parallelism ceiling of
        # every shuffle.  Start each shuffle 4x over-partitioned and let
        # coalescing shrink small stages back down: a volume-heavy
        # shuffle (e.g. the per-doc top-k over a ~250M-row scored token
        # stream at the x1000 probe point) keeps enough partitions to
        # sort in memory instead of spilling (measured: 98.6 s at 32
        # partitions -> 74.7 s at 128, SCALE.md round-9), while
        # small-stage runs coalesce to ~core-count partitions as before.
        # On a real cluster the submitter raises shuffle_partitions and
        # this multiplier scales with it.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(shuffle_partitions * 4),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound Arrow batch size: multimodal pipelines carry MB-scale
        # binary payloads per row, and the default 10k-row batches would
        # put gigabytes in a single python-worker transfer at 100 TB
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # the harness's events table carries TIMESTAMP(NANOS) parquet
        # columns; read them as long and convert in sources.io.read_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
