"""CDM configuration layer: the reference's transform chain applied to
synthetic CDM frames (FIXTURES.md schemas) — column-name goldens mirror
the reference's tier-1 expectations."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pedsnetdcc_spark.cdm import (
    derive_condition_era,
    derive_drug_era,
    transform_cdm_table,
)


@pytest.fixture(scope="module")
def person(spark):
    return spark.createDataFrame(
        [(1, dt.datetime(2010, 6, 15)), (2, dt.datetime(2012, 1, 31))],
        "person_id long, birth_datetime timestamp",
    )


@pytest.fixture(scope="module")
def concept(spark):
    return spark.createDataFrame(
        [(44814724, "Period covering healthcare encounters", "PEDSnet", "Obs Type"),
         (8507, "MALE", "Gender", "Gender"),
         (3023540, "Body height", "LOINC", "Clinical Observation")],
        "concept_id int, concept_name string, vocabulary_id string, concept_class_id string",
    )


def test_transform_chain_golden_columns(spark, person, concept):
    # expectation mirrors the reference golden SQL: age column named
    # <col>_age_in_months + person join (tests/age_transform_test.py:57-67),
    # one *_concept_name per *_concept_id
    # (tests/concept_name_transform_test.py:48-57), literal site column
    # (site_name_transform.py:30-32)
    visits = spark.createDataFrame(
        [(10, 1, dt.datetime(2020, 6, 15), 8507)],
        "visit_occurrence_id long, person_id long, visit_start_datetime timestamp, "
        "visit_concept_id int",
    )
    out = transform_cdm_table(visits, "visit_occurrence", person, concept, site="chop")
    assert "visit_start_datetime_age_in_months" in out.columns
    assert "visit_concept_name" in out.columns
    assert "site" in out.columns
    row = out.collect()[0]
    assert row["site"] == "chop"
    assert row["visit_concept_name"] == "MALE"
    assert row["visit_start_datetime_age_in_months"] == pytest.approx(120.0)


def test_condition_era_merges_with_30_day_gap(spark):
    d = dt.date
    co = spark.createDataFrame(
        [
            # within 30d of previous end -> one era
            (1, 100, d(2020, 1, 1), d(2020, 1, 5)),
            (1, 100, d(2020, 2, 1), None),  # end falls back to start+1
            # 31+ days after padded end -> new era
            (1, 100, d(2020, 4, 1), d(2020, 4, 2)),
            # different concept -> separate stream
            (1, 200, d(2020, 1, 1), d(2020, 1, 2)),
        ],
        "person_id long, condition_concept_id int, condition_start_date date, "
        "condition_end_date date",
    )
    out = {
        (r["person_id"], r["condition_concept_id"], str(r["condition_era_start_date"])):
        (str(r["condition_era_end_date"]), r["condition_occurrence_count"])
        for r in derive_condition_era(co).collect()
    }
    assert out[(1, 100, "2020-01-01")] == ("2020-02-02", 2)
    assert out[(1, 100, "2020-04-01")] == ("2020-04-02", 1)
    assert out[(1, 200, "2020-01-01")] == ("2020-01-02", 1)


def test_drug_era_rollup_and_days_supply(spark):
    d = dt.date
    drug = spark.createDataFrame(
        [
            # two branded drugs rolling up to the same ingredient 900
            (1, 501, d(2020, 1, 1), None, 10),   # end = start + 10 days
            (1, 502, d(2020, 1, 20), None, None),  # end = start + 1 day
            # unmapped drug concept -> dropped by the inner rollup join
            (1, 777, d(2020, 1, 1), None, None),
        ],
        "person_id long, drug_concept_id int, drug_exposure_start_date date, "
        "drug_exposure_end_date date, days_supply int",
    )
    concept = spark.createDataFrame(
        [(900, "ingredientX", "RxNorm", "Ingredient"),
         (901, "brandY", "RxNorm", "Brand Name")],
        "concept_id int, concept_name string, vocabulary_id string, concept_class_id string",
    )
    ancestor = spark.createDataFrame(
        [(900, 501), (900, 502), (901, 501)],
        "ancestor_concept_id int, descendant_concept_id int",
    )
    rows = derive_drug_era(drug, concept, ancestor).collect()
    assert len(rows) == 1  # both exposures merge under ingredient 900
    r = rows[0]
    assert r["drug_concept_id"] == 900
    assert str(r["drug_era_start_date"]) == "2020-01-01"
    assert str(r["drug_era_end_date"]) == "2020-01-21"
    assert r["drug_exposure_count"] == 2
    assert r["gap_days"] == 30


def test_build_recover_cohort(spark):
    import datetime as dt

    from pedsnetdcc_spark.cdm import build_recover_cohort

    meas = spark.createDataFrame(
        [(1, 586516), (2, 9999)], "person_id long, measurement_concept_id long"
    )
    cond = spark.createDataFrame(
        [(3, 320651, 100), (4, 8689, 101), (5, 8689, 102), (6, 777, 103)],
        "person_id long, condition_concept_id long, visit_occurrence_id long",
    )
    visits = spark.createDataFrame(
        [
            (101, dt.date(2020, 5, 1)),   # resp dx, in window -> person 4
            (102, dt.date(2018, 12, 31)), # resp dx, before window -> excluded
            (103, dt.date(2021, 1, 1)),
        ],
        "visit_occurrence_id long, visit_start_date date",
    )
    proc = spark.createDataFrame(
        [(7, 759428), (8, 1)], "person_id long, procedure_concept_id long"
    )
    imm = spark.createDataFrame(
        [(9, 702677)], "person_id long, immunization_concept_id long"
    )
    drug = spark.createDataFrame(
        [(10, 739902), (1, 739902)], "person_id long, drug_concept_id long"
    )
    cohort = build_recover_cohort(meas, cond, visits, proc, imm, drug)
    got = sorted(r["person_id"] for r in cohort.collect())
    # 1 from lab (deduped with vaccine drug), 3 covid dx, 4 resp+visit,
    # 7 vax procedure, 9 CVX, 10 vax drug; 2/5/6/8 excluded
    assert got == [1, 3, 4, 7, 9, 10]


def test_subset_pcornet_composition(spark):
    """The per-table special cases of subset_pcornet_by_cohort.py:186-303:
    patid semi joins, select_all copy, lab_loinc / addressid chained
    subsets, hash_token empty-vs-joined by inc_hash."""
    from pedsnetdcc_spark.pcornet import subset_pcornet

    tables = {
        "demographic": spark.createDataFrame(
            [("P1", "a"), ("P2", "b"), ("P3", "c")], "patid string, name string"
        ),
        "lab_result_cm": spark.createDataFrame(
            [("P1", "L1"), ("P2", "L2"), ("P3", "L3")],
            "patid string, lab_loinc string",
        ),
        "lab_history": spark.createDataFrame(
            [("L1", 10), ("L2", 20), ("L3", 30), ("L9", 90)],
            "lab_loinc string, h long",
        ),
        "lds_address_history": spark.createDataFrame(
            [("P1", "A1"), ("P3", "A3")], "patid string, addressid string"
        ),
        "private_address_geocode": spark.createDataFrame(
            [("A1", 1.0), ("A3", 3.0), ("A9", 9.0)], "addressid string, lat double"
        ),
        "harvest": spark.createDataFrame([("net",)], "networkid string"),
        "hash_token": spark.createDataFrame(
            [("P1", "t1"), ("P3", "t3")], "patid string, token string"
        ),
    }
    cohort = spark.createDataFrame([("P1",), ("P2",)], "patid string")

    sub = subset_pcornet(tables, cohort)
    assert sorted(r["patid"] for r in sub["demographic"].collect()) == ["P1", "P2"]
    assert sorted(r["lab_loinc"] for r in sub["lab_result_cm"].collect()) == ["L1", "L2"]
    # lab_history reduced through SUBSETTED lab_result_cm loincs
    assert sorted(r["lab_loinc"] for r in sub["lab_history"].collect()) == ["L1", "L2"]
    # geocode reduced through SUBSETTED address history (P1 only)
    assert sorted(r["addressid"] for r in sub["lds_address_history"].collect()) == ["A1"]
    assert sorted(r["addressid"] for r in sub["private_address_geocode"].collect()) == ["A1"]
    # select_all table copied whole; hash_token empty without inc_hash
    assert sub["harvest"].count() == 1
    assert sub["hash_token"].count() == 0
    assert sub["hash_token"].columns == ["patid", "token"]

    with_hash = subset_pcornet(tables, cohort, inc_hash=True)
    assert sorted(r["patid"] for r in with_hash["hash_token"].collect()) == ["P1"]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        subset_pcornet({"lab_history": tables["lab_history"]}, cohort)
