"""The flagship ``transform`` pipeline — run_transformation end to end.

Reference flow (pedsnetdcc/transform_runner.py:809-942, traced in
SURVEY.md §3.1): create a ``<schema>_transformed`` build area; for every
non-vocab table compose the transform chain and materialize it with
CTAS statements run by a 25-process pool; then add constraints and
atomically swap the transformed schema into place (keeping a backup for
``undo``).

Spark shape: per-table jobs submitted concurrently from the driver
(the scheduler interleaves their stages), each job = compose the
DataFrame chain → stage parquet; then one atomic ``publish``.
Constraint DDL becomes a validation report (operators/constraints.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pedsnetdcc_spark.cdm import transform_cdm_table
from pedsnetdcc_spark.operators.constraints import validate_table
from pedsnetdcc_spark.plans.pipeline import Job, check_jobs, run_parallel
from pedsnetdcc_spark.schema_registry import VOCAB_TABLES, stock_schemas
from pedsnetdcc_spark.sources.io import TableStore


def run_transformation(
    spark: SparkSession,
    store: TableStore,
    tables: dict[str, DataFrame],
    person: DataFrame,
    concept: DataFrame,
    site: str,
    transform: Callable[..., DataFrame] = transform_cdm_table,
    pool_size: int = 25,
    validate: bool = True,
    model_version: str = "2.3.0",
) -> dict[str, dict[str, int]]:
    """Transform every non-vocab table, stage, and atomically publish.

    Returns the per-table constraint-validation report (empty when
    ``validate=False``).  The prior generation stays in ``_backup`` —
    ``store.undo()`` is the reference's ``undo`` command.
    """
    work = {n: df for n, df in tables.items() if n not in VOCAB_TABLES}

    def build(name: str, df: DataFrame) -> Callable[[], object]:
        def job():
            out = transform(df, name, person, concept, site)
            store.stage(out, name)
            return out

        return job

    jobs = [Job(name, build(name, df)) for name, df in sorted(work.items())]
    done = run_parallel(jobs, pool_size=pool_size)
    check_jobs(done)
    store.publish()

    report: dict[str, dict[str, int]] = {}
    if validate:
        schemas = stock_schemas(model_version)
        published = {n: store.read(spark, n) for n in work}
        for name in work:
            if name in schemas:
                report[name] = validate_table(
                    published[name], schemas[name], refs=published
                )
    return report
