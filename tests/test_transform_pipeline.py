"""End-to-end transform pipeline: synthetic CDM namespace → transform
chain → atomic publish → constraint report → undo."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pedsnetdcc_spark.operators.ids import (
    IdAllocator,
    assign_surrogate_ids,
    reserve_negative,
)
from pedsnetdcc_spark.plans.transform_pipeline import run_transformation
from pedsnetdcc_spark.sources.io import TableStore


@pytest.fixture()
def cdm_frames(spark):
    person = spark.createDataFrame(
        [(1, dt.datetime(2010, 6, 15), 8507), (2, dt.datetime(2012, 1, 31), 8532)],
        "person_id long, birth_datetime timestamp, gender_concept_id int",
    )
    concept = spark.createDataFrame(
        [(8507, "MALE", "Gender", "Gender"), (8532, "FEMALE", "Gender", "Gender"),
         (9201, "Inpatient Visit", "Visit", "Visit")],
        "concept_id int, concept_name string, vocabulary_id string, concept_class_id string",
    )
    visits = spark.createDataFrame(
        [(10, 1, dt.date(2020, 6, 15), dt.datetime(2020, 6, 15), 9201),
         (11, 2, dt.date(2021, 1, 31), dt.datetime(2021, 1, 31), 9201)],
        "visit_occurrence_id long, person_id long, visit_start_date date, "
        "visit_start_datetime timestamp, visit_concept_id int",
    )
    return person, concept, visits


def test_run_transformation_end_to_end(spark, tmp_path, cdm_frames):
    person, concept, visits = cdm_frames
    store = TableStore(str(tmp_path / "site_a"))
    report = run_transformation(
        spark,
        store,
        {"visit_occurrence": visits, "person": person, "concept": concept},
        person,
        concept,
        site="site_a",
    )
    # vocab table excluded from transformation
    import os

    assert not os.path.exists(os.path.join(store.current_dir, "concept"))
    out = store.read(spark, "visit_occurrence")
    assert {"visit_start_datetime_age_in_months", "visit_concept_name", "site"} <= set(
        out.columns
    )
    assert out.count() == 2
    assert report["visit_occurrence"]["pk:visit_occurrence_id"] == 0
    assert report["visit_occurrence"]["fk:person_id->person.person_id"] == 0

    # publish again (new generation), then undo restores the first
    visits2 = visits.limit(1)
    store2 = TableStore(str(tmp_path / "site_a"), _txid="gen2")
    run_transformation(
        spark, store2,
        {"visit_occurrence": visits2}, person, concept, site="site_a", validate=False,
    )
    assert store2.read(spark, "visit_occurrence").count() == 1
    store2.undo()
    assert store2.read(spark, "visit_occurrence").count() == 2


def test_negative_era_ids(spark, tmp_path):
    alloc = IdAllocator(str(tmp_path / "a.json"))
    base = reserve_negative(alloc, "condition_era", 5)
    assert base == -2_147_483_648
    eras = spark.range(5).toDF("k")
    out = assign_surrogate_ids(eras, "condition_era_id", "k", base=base)
    ids = sorted(r["condition_era_id"] for r in out.collect())
    assert ids == list(range(-2_147_483_647, -2_147_483_642))
    assert all(i <= 0 for i in ids)
    base2 = reserve_negative(alloc, "condition_era", 3)
    assert base2 == base + 5  # contiguous continuation

    with pytest.raises(OverflowError):
        reserve_negative(alloc, "condition_era", 2**31 + 10)