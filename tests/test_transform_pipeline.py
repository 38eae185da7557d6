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


def test_publish_applies_cluster_specs(spark, tmp_path, cdm_frames):
    """The transform pipeline must lay published CDM tables out
    CLUSTERED on their reference index columns (CLUSTER_SPECS — the
    lake analog of the reference rebuilding per-column b-tree indexes
    after every load, reference indexes.py:202-317): person_id
    predicates then prune files via parquet min/max footers."""
    import datetime as dt

    from pedsnetdcc_spark.sources.clustering import leading_column_file_ranges

    person_rows = [
        (p, dt.datetime(2010, 1, 1) + dt.timedelta(days=p % 365), 8507)
        for p in range(1, 501)
    ]
    person = spark.createDataFrame(
        person_rows, "person_id long, birth_datetime timestamp, gender_concept_id int"
    )
    _, concept, _ = cdm_frames
    visit_rows = [
        (v, (v * 131) % 500 + 1, dt.date(2020, 1, 1), dt.datetime(2020, 1, 1), 9201)
        for v in range(2000)
    ]
    visits = spark.createDataFrame(
        visit_rows,
        "visit_occurrence_id long, person_id long, visit_start_date date, "
        "visit_start_datetime timestamp, visit_concept_id int",
    )
    store = TableStore(str(tmp_path / "clustered_site"))
    run_transformation(
        spark, store, {"visit_occurrence": visits}, person, concept,
        site="site_a", validate=False, cluster_files=8,
    )
    ranges = leading_column_file_ranges(
        str(tmp_path / "clustered_site/current/visit_occurrence"), "person_id"
    )
    assert len(ranges) > 1
    # clustered layout: per-file person_id spans are narrow slices of
    # the 1..500 global range...
    avg_width = sum(hi - lo for lo, hi in ranges) / len(ranges)
    assert avg_width < 0.5 * (500 - 1)
    # ...and files are range-disjoint (equal keys land in one file), so
    # an equality predicate prunes all but one file
    ordered = sorted(ranges)
    assert all(ordered[i][1] <= ordered[i + 1][0] for i in range(len(ordered) - 1))


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