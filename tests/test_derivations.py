"""E2E tests for the concrete R-package post-processing pipelines
(obs_covid, mg/kg dose, lab_loinc swap) with dataframe_package
stand-ins for the external tools."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pedsnetdcc_spark.plans.derivations import (
    obs_covid_post_process,
    publish_updated_measurement,
    run_mgkg_dose,
    run_obs_covid,
    update_drug_exposure_doses,
)
from pedsnetdcc_spark.plans.packages import dataframe_package, register_package


@pytest.fixture()
def cdm(spark):
    person = spark.createDataFrame(
        [(1, dt.datetime(2010, 1, 31)), (2, dt.datetime(2012, 2, 29))],
        "person_id long, birth_datetime timestamp",
    )
    concept = spark.createDataFrame(
        [(100, "covid test"), (101, "src covid"), (102, "lab type"),
         (103, "qual"), (104, "unit x"), (105, "positive")],
        "concept_id long, concept_name string",
    )
    derived = spark.createDataFrame(
        [
            (1000, 1, dt.datetime(2021, 3, 10), 100, 101, 102, 103, 104, 105),
            (1001, 2, dt.datetime(2021, 4, 2), 100, 999, 102, None, 104, 105),
        ],
        "observation_id long, person_id long, observation_datetime timestamp,"
        " observation_concept_id long, observation_source_concept_id long,"
        " observation_type_concept_id long, qualifier_concept_id long,"
        " unit_concept_id long, value_as_concept_id long",
    )
    return person, concept, derived


def test_obs_covid_post_process(spark, cdm):
    person, concept, derived = cdm
    out = obs_covid_post_process(derived, concept, person)
    rows = {r["observation_id"]: r for r in out.collect()}
    assert rows[1000]["observation_concept_name"] == "covid test"
    assert rows[1000]["value_as_concept_name"] == "positive"
    # unmapped id and NULL id both fall through to NULL (LEFT joins)
    assert rows[1001]["observation_source_concept_name"] is None
    assert rows[1001]["qualifier_concept_name"] is None
    # age: 2010-01-31 -> 2021-03-10: day borrow 10-31+31 = 10 over the
    # anchor span 2021-02-28 -> 2021-03-31 = 31 days, total months 133
    assert rows[1000]["observation_age_in_months"] == pytest.approx(
        133 + 10 / 31, abs=1e-12
    )


def test_run_obs_covid_pipeline_conflict_skip(spark, cdm):
    person, concept, derived = cdm
    register_package("obs_covid_test", dataframe_package(lambda spark: derived))
    # pre-existing observation 1000 must NOT be overwritten (ON CONFLICT
    # DO NOTHING); 1001 must be inserted.
    observation = spark.createDataFrame(
        [(1000, 1, dt.datetime(2020, 1, 1))],
        "observation_id long, person_id long, observation_datetime timestamp",
    )
    final, updated = run_obs_covid(
        spark, {}, observation, concept, person, package="obs_covid_test"
    )
    assert final.count() == 2
    got = {r["observation_id"]: r for r in updated.collect()}
    assert set(got) == {1000, 1001}
    assert got[1000]["observation_datetime"] == dt.datetime(2020, 1, 1)  # kept
    assert got[1001]["observation_datetime"] == dt.datetime(2021, 4, 2)


def test_update_drug_exposure_doses(spark):
    de = spark.createDataFrame(
        [
            (10, 1, 0, 0.0, "old"),
            (11, 1, 0, 0.0, "old"),
            (12, 2, 5, 1.5, "keep"),
        ],
        "drug_exposure_id long, person_id long, dose_unit_concept_id long,"
        " effective_drug_dose double, dose_unit_concept_name string",
    )
    dev = spark.createDataFrame(
        [(10, 1, 8576, 12.5, "milligram per kilogram")],
        "drug_exposure_id long, person_id long, dose_unit_concept_id long,"
        " effective_drug_dose double, dose_unit_concept_name string",
    )
    out = {r["drug_exposure_id"]: r for r in update_drug_exposure_doses(de, dev).collect()}
    assert out[10]["dose_unit_concept_id"] == 8576
    assert out[10]["effective_drug_dose"] == 12.5
    assert out[10]["dose_unit_concept_name"] == "milligram per kilogram"
    assert out[11]["dose_unit_concept_name"] == "old"  # unmatched person row kept
    assert out[12]["effective_drug_dose"] == 1.5


def test_run_mgkg_dose_package(spark):
    de = spark.createDataFrame(
        [(10, 1, 0, 0.0, "old")],
        "drug_exposure_id long, person_id long, dose_unit_concept_id long,"
        " effective_drug_dose double, dose_unit_concept_name string",
    )
    dev_rows = [(10, 1, 8576, 3.25, "mg/kg")]

    def fake_r(spark):
        return spark.createDataFrame(
            dev_rows,
            "drug_exposure_id long, person_id long, dose_unit_concept_id long,"
            " effective_drug_dose double, dose_unit_concept_name string",
        )

    register_package("mgkg_test", dataframe_package(fake_r))
    out = run_mgkg_dose(spark, {}, de, package="mgkg_test").collect()
    assert out[0]["effective_drug_dose"] == 3.25


def test_publish_updated_measurement_swap(spark, tmp_path):
    from pedsnetdcc_spark.sources.io import TableStore

    store = TableStore(str(tmp_path / "warehouse"))
    meas = spark.createDataFrame([(1, "orig")], "measurement_id long, v string")
    upd = spark.createDataFrame([(1, "loinc"), (2, "loinc")], "measurement_id long, v string")
    other = spark.createDataFrame([(7,)], "person_id long")
    store.stage(meas, "measurement")
    store.stage(upd, "updated_measurement")
    store.stage(other, "person")
    store.publish()

    publish_updated_measurement(spark, store)
    assert store.read(spark, "measurement").count() == 2
    assert store.read(spark, "measurement_orig").collect()[0]["v"] == "orig"
    assert store.read(spark, "person").count() == 1  # carried forward
    # the swap is one generation: undo() restores the pre-swap schema
    store.undo()
    assert store.read(spark, "measurement").count() == 1
