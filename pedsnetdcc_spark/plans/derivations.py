"""Concrete derivation pipelines around the external-package hook:
the reference's R-driven derivations each run an external package and
then post-process the result with plain relational steps.  The external
step stays behind :mod:`plans.packages`; the post-steps are wired here
as engine operators.

- **obs_covid** (reference pedsnetdcc/r_obs_covid.py): R produces
  ``observation_derivation_covid``; post-steps fill six concept-name
  columns from ``concept`` (:25-61 ``_fill_concept_names``), compute
  ``observation_age_in_months`` from person.birth_datetime
  (:66-117 ``_fill_age_in_months``), and conflict-skip copy into
  ``observation`` (:125-155 ``_copy_to_obs_table`` ON CONFLICT DO
  NOTHING).
- **mg/kg dose** (reference pedsnetdcc/r_dose.py:19-41
  ``_update_drug_exposure``): correlated UPDATE of three dose columns
  on ``drug_exposure`` from ``drug_exposures_mgkg_derivations`` keyed
  on (person_id, drug_exposure_id).
- **lab_loinc** (reference pedsnetdcc/lab_loinc.py:81-175
  ``run_post_lab_loinc``): swap ``updated_measurement`` into place as
  ``measurement``, keeping the original as ``measurement_orig``.  The
  reference's PK/FK/index rebuild steps are Postgres-physical and map
  to no-ops here (SURVEY.md §4); the rename pair is the real semantic
  step and is done as one atomic TableStore publish.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pedsnetdcc_spark.functions.intervals import months_in_interval
from pedsnetdcc_spark.operators.transforms import (
    DimensionLookup,
    recompute_column,
    with_dimension_names,
)
from pedsnetdcc_spark.operators.upsert import insert_missing
from pedsnetdcc_spark.plans.packages import run_package
from pedsnetdcc_spark.sources.io import TableStore

# r_obs_covid.py:26-49 — the six name columns _fill_concept_names sets.
COVID_NAME_COLUMNS: dict[str, str] = {
    "observation_concept_id": "observation_concept_name",
    "observation_source_concept_id": "observation_source_concept_name",
    "observation_type_concept_id": "observation_type_concept_name",
    "qualifier_concept_id": "qualifier_concept_name",
    "unit_concept_id": "unit_concept_name",
    "value_as_concept_id": "value_as_concept_name",
}


def fill_concept_names(
    df: DataFrame,
    concept: DataFrame,
    columns: Mapping[str, str],
    key_col: str = "concept_id",
    name_col: str = "concept_name",
) -> DataFrame:
    """One aliased broadcast LEFT join per (id column → name column)
    pair — the UPDATE…FROM self-join subquery of ``_fill_concept_names``
    collapses to the join chain itself (no in-place update in Spark)."""
    lookups = [DimensionLookup(fk, name_col, out) for fk, out in columns.items()]
    return with_dimension_names(df, concept, key_col, lookups)


def fill_age_in_months(
    df: DataFrame,
    person: DataFrame,
    event_col: str,
    out_col: str,
    key: str = "person_id",
    birth_col: str = "birth_datetime",
    broadcast: bool = True,
) -> DataFrame:
    """``_fill_age_in_months``: join person, set
    ``out_col = months_in_interval(birth, event)`` (r_obs_covid.py
    :103-110 subquery join on person_id)."""
    a = person.select(F.col(key), F.col(birth_col).alias("__birth"))
    if broadcast:
        a = F.broadcast(a)
    out = df.join(a, key, "inner")
    return out.withColumn(
        out_col, months_in_interval(F.col("__birth"), F.col(event_col))
    ).drop("__birth")


def obs_covid_post_process(
    derived: DataFrame, concept: DataFrame, person: DataFrame
) -> DataFrame:
    """The full r_obs_covid post-processing chain over the package
    output: six concept names + observation_age_in_months."""
    out = fill_concept_names(derived, concept, COVID_NAME_COLUMNS)
    return fill_age_in_months(
        out, person, "observation_datetime", "observation_age_in_months"
    )


def run_obs_covid(
    spark: SparkSession,
    config: dict[str, Any],
    observation: DataFrame,
    concept: DataFrame,
    person: DataFrame,
    package: str = "obs_covid",
) -> tuple[DataFrame, DataFrame]:
    """End-to-end COVID observation derivation: external package →
    post-process → conflict-skip copy into ``observation``
    (r_obs_covid.py:226+ run_r_query then the three post functions).

    Returns ``(observation_derivation_covid, observation_updated)``.
    """
    derived = run_package(spark, package, config)
    final = obs_covid_post_process(derived, concept, person)
    common = [c for c in observation.columns if c in final.columns]
    updated = insert_missing(
        observation, final.select(*common), keys=["observation_id"]
    )
    return final, updated


# r_dose.py:19-29 — the three columns _update_drug_exposure overwrites.
DOSE_UPDATE_COLUMNS: tuple[str, ...] = (
    "dose_unit_concept_id",
    "effective_drug_dose",
    "dose_unit_concept_name",
)


def update_drug_exposure_doses(
    drug_exposure: DataFrame,
    derivations: DataFrame,
    columns: Sequence[str] = DOSE_UPDATE_COLUMNS,
) -> DataFrame:
    """mg/kg dose correlated update (r_dose.py:19-41): rows matching a
    derivation on (person_id, drug_exposure_id) take the derived dose
    columns; all other rows keep their values."""
    out = drug_exposure
    for col in columns:
        out = recompute_column(
            out, derivations, key=["person_id", "drug_exposure_id"], col=col
        )
    return out


def run_mgkg_dose(
    spark: SparkSession,
    config: dict[str, Any],
    drug_exposure: DataFrame,
    package: str = "mgkg_dose",
) -> DataFrame:
    """External mg/kg derivation then the correlated update."""
    derivations = run_package(spark, package, config)
    return update_drug_exposure_doses(drug_exposure, derivations)


def publish_updated_measurement(
    spark: SparkSession,
    store: TableStore,
    updated_name: str = "updated_measurement",
    table_name: str = "measurement",
    orig_name: str = "measurement_orig",
) -> None:
    """lab_loinc post-steps (lab_loinc.py:110-120): one atomic publish
    renames ``measurement`` → ``measurement_orig`` and installs
    ``updated_measurement`` as ``measurement``.  Index/PK/FK rebuilds
    (lab_loinc.py:121-165) are physical-storage concerns with no Spark
    analog."""
    import os

    updated = store.read(spark, updated_name)
    orig = store.read(spark, table_name)
    store.stage(updated, table_name)
    store.stage(orig, orig_name)
    # publish() swaps the whole generation: carry every other table
    # forward unchanged so the swap stays atomic across the schema.
    for name in os.listdir(store.current_dir):
        if name in (updated_name, table_name, orig_name) or name.startswith("_"):
            continue
        store.stage(store.read(spark, name), name)
    store.publish()
