"""Schema registry — the data-models-service / ``stock_metadata`` analog.

The reference fetches versioned SQLAlchemy metadata for the PEDSnet CDM
from a remote data-models service and derives all DDL (PKs, FKs, NOT
NULLs, indexes) from it; transforms then mutate the metadata in place to
describe the post-transform schema (reference: pedsnetdcc/utils.py:
281-291 ``stock_metadata``; abstract_transform.py:88-109
``modify_metadata``; table families in pedsnetdcc/__init__.py:29-93).

Here the registry is a plain Python module returning Spark
``StructType`` per (table, model_version), with the same constraint
metadata carried in field metadata / side tables:

- ``nullable`` on the StructField ≙ NOT NULL (validated by
  operators/constraints.py — Spark does not enforce),
- ``primary_key`` / ``foreign_keys`` entries ≙ PK/FK constraint lists
  (validated as uniqueness / referential-integrity checks),
- ``VOCAB_TABLES`` ≙ the read-only vocabulary family excluded from
  transforms (pedsnetdcc/__init__.py:29-41),
- ``FACT_RELATIONSHIP_DOMAINS`` ≙ the polymorphic domain codes
  (pedsnetdcc/__init__.py:45-54).

The table set here is the minimal CDM slice the surveyed operators
touch (FIXTURES.md §2); extending a model version = adding entries.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

VOCAB_TABLES = {
    "vocabulary",
    "concept",
    "concept_ancestor",
    "concept_class",
    "concept_relationship",
    "concept_synonym",
    "domain",
    "drug_strength",
    "relationship",
    "source_to_concept_map",
    "cohort_definition",
}

# domain code → target table for the polymorphic fact_relationship ids
FACT_RELATIONSHIP_DOMAINS = {
    8: "visit_occurrence",
    13: "drug_exposure",
    17: "device_exposure",
    19: "condition_occurrence",
    21: "measurement",
    27: "observation",
    56: "person",
}


@dataclass(frozen=True)
class TableSchema:
    name: str
    struct: T.StructType
    primary_key: tuple[str, ...] = ()
    foreign_keys: tuple[tuple[str, str, str], ...] = ()  # (col, ref_table, ref_col)

    def field(self, name: str) -> T.StructField:
        return self.struct[name]


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


_LONG, _INT, _STR = T.LongType(), T.IntegerType(), T.StringType()
_DATE, _TS, _DBL = T.DateType(), T.TimestampType(), T.DoubleType()
_NUM = T.DecimalType(20, 5)


def _cdm_2_3() -> dict[str, TableSchema]:
    t: dict[str, TableSchema] = {}

    def add(name, fields, pk=(), fks=()):
        t[name] = TableSchema(name, T.StructType(fields), tuple(pk), tuple(fks))

    add(
        "person",
        [
            _f("person_id", _LONG, False),
            _f("birth_datetime", _TS, False),
            _f("gender_concept_id", _INT, False),
            _f("race_concept_id", _INT),
            _f("ethnicity_concept_id", _INT),
            _f("location_id", _LONG),
            _f("care_site_id", _LONG),
            _f("provider_id", _LONG),
        ],
        pk=("person_id",),
        fks=(
            ("location_id", "location", "location_id"),
            ("care_site_id", "care_site", "care_site_id"),
            ("provider_id", "provider", "provider_id"),
        ),
    )
    add(
        "visit_occurrence",
        [
            _f("visit_occurrence_id", _LONG, False),
            _f("person_id", _LONG, False),
            _f("visit_start_date", _DATE, False),
            _f("visit_start_datetime", _TS),
            _f("visit_end_date", _DATE),
            _f("visit_end_datetime", _TS),
            _f("visit_concept_id", _INT, False),
        ],
        pk=("visit_occurrence_id",),
        fks=(("person_id", "person", "person_id"),),
    )
    add(
        "condition_occurrence",
        [
            _f("condition_occurrence_id", _LONG, False),
            _f("person_id", _LONG, False),
            _f("condition_concept_id", _INT, False),
            _f("condition_start_date", _DATE, False),
            _f("condition_start_datetime", _TS),
            _f("condition_end_date", _DATE),
            _f("condition_end_datetime", _TS),
            _f("visit_occurrence_id", _LONG),
        ],
        pk=("condition_occurrence_id",),
        fks=(
            ("person_id", "person", "person_id"),
            ("visit_occurrence_id", "visit_occurrence", "visit_occurrence_id"),
        ),
    )
    add(
        "drug_exposure",
        [
            _f("drug_exposure_id", _LONG, False),
            _f("person_id", _LONG, False),
            _f("drug_concept_id", _INT, False),
            _f("drug_type_concept_id", _INT, False),
            _f("drug_exposure_start_date", _DATE, False),
            _f("drug_exposure_end_date", _DATE),
            _f("days_supply", _INT),
            _f("visit_occurrence_id", _LONG),
            _f("dose_unit_concept_id", _INT),
            _f("effective_drug_dose", _DBL),
        ],
        pk=("drug_exposure_id",),
        fks=(("person_id", "person", "person_id"),),
    )
    add(
        "measurement",
        [
            _f("measurement_id", _LONG, False),
            _f("person_id", _LONG, False),
            _f("measurement_concept_id", _INT, False),
            _f("measurement_date", _DATE, False),
            _f("measurement_datetime", _TS),
            _f("measurement_type_concept_id", _INT, False),
            _f("value_as_number", _NUM),
            _f("value_as_concept_id", _INT),
            _f("unit_concept_id", _INT),
            _f("provider_id", _LONG),
            _f("visit_occurrence_id", _LONG),
            _f("measurement_source_value", _STR),
            _f("value_source_value", _STR),
        ],
        pk=("measurement_id",),
        fks=(("person_id", "person", "person_id"),),
    )
    add(
        "observation",
        [
            _f("observation_id", _LONG, False),
            _f("person_id", _LONG, False),
            _f("observation_concept_id", _INT, False),
            _f("observation_date", _DATE, False),
            _f("observation_datetime", _TS),
            _f("value_as_number", _NUM),
            _f("value_as_string", _STR),
            _f("visit_occurrence_id", _LONG),
        ],
        pk=("observation_id",),
        fks=(("person_id", "person", "person_id"),),
    )
    add(
        "fact_relationship",
        [
            _f("domain_concept_id_1", _INT, False),
            _f("fact_id_1", _LONG, False),
            _f("domain_concept_id_2", _INT, False),
            _f("fact_id_2", _LONG, False),
            _f("relationship_concept_id", _INT, False),
        ],
    )
    add(
        "observation_period",
        [
            _f("observation_period_id", _LONG, False),
            _f("person_id", _LONG, False),
            _f("observation_period_start_date", _TS, False),
            _f("observation_period_end_date", _TS, False),
            _f("period_type_concept_id", _INT, False),
        ],
        pk=("observation_period_id",),
        fks=(("person_id", "person", "person_id"),),
    )
    add(
        "concept",
        [
            _f("concept_id", _INT, False),
            _f("concept_name", _STR, False),
            _f("vocabulary_id", _STR, False),
            _f("concept_class_id", _STR, False),
            _f("standard_concept", _STR),
        ],
        pk=("concept_id",),
    )
    add(
        "concept_ancestor",
        [
            _f("ancestor_concept_id", _INT, False),
            _f("descendant_concept_id", _INT, False),
        ],
    )
    return t


_MODELS: dict[str, dict[str, TableSchema]] = {"2.3.0": _cdm_2_3()}


def stock_schemas(model_version: str = "2.3.0") -> dict[str, TableSchema]:
    """The ``stock_metadata`` analog (utils.py:281-291)."""
    if model_version not in _MODELS:
        raise KeyError(f"unknown model version {model_version!r}")
    return dict(_MODELS[model_version])


def transform_schema(
    ts: TableSchema, added: list[T.StructField]
) -> TableSchema:
    """The ``modify_metadata`` analog: transforms append columns to the
    post-transform schema (abstract_transform.py:88-109; transforms only
    ever add columns, never remove — SURVEY.md §2.2 P1)."""
    return TableSchema(
        ts.name,
        T.StructType(list(ts.struct.fields) + added),
        ts.primary_key,
        ts.foreign_keys,
    )
