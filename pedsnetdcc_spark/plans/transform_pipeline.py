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
from pedsnetdcc_spark.sources.clustering import CLUSTER_SPECS
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
    cluster_specs: dict[str, list[str]] | None = None,
    cluster_files: int | None = None,
) -> dict[str, dict[str, int]]:
    """Transform every non-vocab table, stage, and atomically publish.

    Each staged table whose name appears in ``cluster_specs`` (default:
    sources/clustering.CLUSTER_SPECS — the reference's post-load index
    column lists, reference indexes.py:202-317) is written CLUSTERED on
    those columns: range-partitioned + sorted so person_id/concept-id
    predicates prune files via parquet min/max statistics, the lake
    analog of the reference rebuilding its b-tree indexes after every
    load.  Pass ``cluster_specs={}`` to disable.

    Returns the per-table constraint-validation report (empty when
    ``validate=False``).  The prior generation stays in ``_backup`` —
    ``store.undo()`` is the reference's ``undo`` command.
    """
    specs = CLUSTER_SPECS if cluster_specs is None else cluster_specs
    work = {n: df for n, df in tables.items() if n not in VOCAB_TABLES}

    def build(name: str, df: DataFrame) -> Callable[[], object]:
        def job():
            out = transform(df, name, person, concept, site)
            spec = [c for c in specs.get(name, []) if c in out.columns]
            store.stage(out, name, cluster_by=spec or None, cluster_files=cluster_files)
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
