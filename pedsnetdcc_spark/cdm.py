"""The PEDSnet CDM configuration layer: the reference's per-table
transform configuration applied through the generic operators.

The generic operators (operators/*) are schema-parameterized; this
module carries the CDM-specific wiring so a pedsnetdcc user gets the
same ``transform`` pipeline shape: per non-vocab table,
Age → ConceptName → SiteName (→ IDMapping) applied as one composed
DataFrame chain (reference: pedsnetdcc/transform_runner.py:38-99 runs
the same chain over every table).

Configuration provenance:
- age columns per table: pedsnetdcc/age_transform.py:51-60
  ``AgeTransform.columns_by_table``
- concept-name convention: every ``*_concept_id`` column gains a
  ``*_concept_name`` via an aliased LEFT JOIN to ``concept``
  (pedsnetdcc/concept_name_transform.py:46-56)
- site tag column: pedsnetdcc/site_name_transform.py:30-32
- era configs: 30-day gap for condition & drug eras
  (pedsnetdcc/era.py:35,66-69,161,192-195), drug end-date fallback
  ``COALESCE(end, start + days_supply, start + 1 day)`` (era.py:146),
  RxNorm Ingredient / Clinical Drug Form rollups (era.py:148-153,
  276-281)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pedsnetdcc_spark.operators.eras import derive_eras, rollup_hierarchy
from pedsnetdcc_spark.operators.transforms import (
    DimensionLookup,
    with_dimension_names,
    with_interval_months,
    with_literal_column,
)

# AgeTransform.columns_by_table (age_transform.py:51-60)
AGE_COLUMNS_BY_TABLE: dict[str, tuple[str, ...]] = {
    "condition_occurrence": ("condition_start_datetime",),
    "death": ("death_datetime",),
    "device_exposure": ("device_exposure_start_datetime",),
    "drug_exposure": ("drug_exposure_start_datetime",),
    "measurement": ("measurement_datetime", "measurement_result_datetime"),
    "procedure_occurrence": ("procedure_datetime",),
    "visit_occurrence": ("visit_start_datetime",),
    "observation": ("observation_datetime",),
}

AGE_SUFFIX = "_age_in_months"  # age_transform.py appends this suffix
SITE_COLUMN = "site"


def with_cdm_ages(
    df: DataFrame, table_name: str, person: DataFrame
) -> DataFrame:
    """Apply the AgeTransform for a CDM table: inner join ``person`` and
    add ``<col>_age_in_months`` per configured datetime column."""
    cols = [c for c in AGE_COLUMNS_BY_TABLE.get(table_name, ()) if c in df.columns]
    if not cols:
        return df
    anchor = person.select("person_id", "birth_datetime")
    return with_interval_months(
        df, anchor, key="person_id", anchor_col="birth_datetime",
        event_cols=cols, suffix=AGE_SUFFIX,
    )


def with_cdm_concept_names(df: DataFrame, concept: DataFrame) -> DataFrame:
    """Apply the ConceptNameTransform: one broadcast left join per
    ``*_concept_id`` column adding ``*_concept_name``."""
    lookups = [
        DimensionLookup(c, "concept_name", c.replace("_concept_id", "_concept_name"))
        for c in df.columns
        if c.endswith("_concept_id")
    ]
    if not lookups:
        return df
    return with_dimension_names(df, concept, "concept_id", lookups)


def transform_cdm_table(
    df: DataFrame,
    table_name: str,
    person: DataFrame,
    concept: DataFrame,
    site: str,
) -> DataFrame:
    """The flagship transform chain for one table
    (transform_runner.py:434-99 order: Age, ConceptName, SiteName)."""
    out = with_cdm_ages(df, table_name, person)
    out = with_cdm_concept_names(out, concept)
    return with_literal_column(out, SITE_COLUMN, site)


# --- RECOVER cohort configuration (recover_cohort.py:12-201) ---


def build_recover_cohort(
    measurement: DataFrame,
    condition_occurrence: DataFrame,
    visit_occurrence: DataFrame,
    procedure_occurrence: DataFrame,
    immunization: DataFrame,
    drug_exposure: DataFrame,
) -> DataFrame:
    """The concrete RECOVER cohort over the six reference branches
    (reference recover_cohort.py:12-201 RECOVER_COHORT_SQL): COVID lab
    measurements, COVID/MIS-C/PASC diagnoses, respiratory diagnoses
    with a visit starting on/after 2019-01-01 (the SQL's date literal —
    its comment says 2020, the code says 2019; we follow the code),
    vaccine procedures, CVX immunizations, and vaccine drug exposures.
    Concept sets live in :mod:`pedsnetdcc_spark.recover_concepts`.

    Scale: each branch is a filtered distinct-key projection (map-side
    partial agg before one shuffle); the respiratory branch's visit
    join filters visits BEFORE joining so only post-2019 visit keys
    shuffle."""
    from pedsnetdcc_spark import recover_concepts as rc
    from pedsnetdcc_spark.operators.cohort import distinct_cohort

    visits_2019 = visit_occurrence.where(
        F.col("visit_start_date") >= F.lit(rc.RESP_DX_VISIT_START_MIN).cast("date")
    ).select("visit_occurrence_id")
    resp = condition_occurrence.where(
        F.col("condition_concept_id").isin(list(rc.RESP_DX_CONCEPT_IDS))
    ).join(visits_2019, "visit_occurrence_id")
    domains = [
        (
            measurement,
            "person_id",
            F.col("measurement_concept_id").isin(list(rc.COVID_LAB_CONCEPT_IDS)),
        ),
        (
            condition_occurrence,
            "person_id",
            F.col("condition_concept_id").isin(list(rc.COVID_DX_CONCEPT_IDS)),
        ),
        (resp, "person_id", None),
        (
            procedure_occurrence,
            "person_id",
            F.col("procedure_concept_id").isin(
                list(rc.COVID_VAX_PROCEDURE_CONCEPT_IDS)
            ),
        ),
        (
            immunization,
            "person_id",
            F.col("immunization_concept_id").isin(list(rc.COVID_VAX_CVX_CONCEPT_IDS)),
        ),
        (
            drug_exposure,
            "person_id",
            F.col("drug_concept_id").isin(list(rc.COVID_VAX_DRUG_CONCEPT_IDS)),
        ),
    ]
    return distinct_cohort(domains)


# --- observation-period sync configuration (sync_observation_period.py:8-52) ---

# table → ((start datetime, start date fallback), (end datetime, end date
# fallback)); tables whose SQL uses the same column for min and max (procedure,
# observation, measurement, death) repeat the start pair.
OBS_PERIOD_DOMAINS: dict[str, tuple[tuple[str, str], tuple[str, str]]] = {
    "visit_occurrence": (
        ("visit_start_datetime", "visit_start_date"),
        ("visit_end_datetime", "visit_end_date"),
    ),
    "procedure_occurrence": (
        ("procedure_datetime", "procedure_date"),
        ("procedure_datetime", "procedure_date"),
    ),
    "condition_occurrence": (
        ("condition_start_datetime", "condition_start_date"),
        ("condition_end_datetime", "condition_end_date"),
    ),
    "drug_exposure": (
        ("drug_exposure_start_datetime", "drug_exposure_start_date"),
        ("drug_exposure_end_datetime", "drug_exposure_end_date"),
    ),
    "observation": (
        ("observation_datetime", "observation_date"),
        ("observation_datetime", "observation_date"),
    ),
    "measurement": (
        ("measurement_datetime", "measurement_date"),
        ("measurement_datetime", "measurement_date"),
    ),
    "death": (("death_datetime", "death_date"), ("death_datetime", "death_date")),
}

OBS_PERIOD_TYPE_CONCEPT_ID = 44814724  # sync_observation_period.py:73


def derive_observation_period(
    tables: dict[str, DataFrame], id_mode: str = "distributed"
) -> DataFrame:
    """Recompute ``observation_period`` from the fact tables present —
    the ``sync_observation_period`` derivation (reference
    sync_observation_period.py:8-78): per-person min/max over the seven
    domain tables' coalesced datetime/date pairs, null maxes backfilled
    from mins, constant period type, row-numbered surrogate id.

    Scale: each domain contributes a map-side partial min/max before the
    single person-keyed shuffle (operators/interval_summary).  The id is
    assigned in ``distributed`` mode by default (per-partition offsets);
    pass ``id_mode="window"`` for the reference's literal global
    ``row_number()`` ordering.
    """
    from pedsnetdcc_spark.operators.ids import assign_surrogate_ids
    from pedsnetdcc_spark.operators.interval_summary import interval_summary

    domains = []
    for name, ((sdt, sd), (edt, ed)) in OBS_PERIOD_DOMAINS.items():
        df = tables.get(name)
        if df is None:
            continue
        start_cols = [F.col(c).cast("timestamp") for c in (sdt, sd) if c in df.columns]
        end_cols = [F.col(c).cast("timestamp") for c in (edt, ed) if c in df.columns]
        if not start_cols:
            continue
        domains.append(
            (
                df,
                "person_id",
                F.coalesce(*start_cols),
                F.coalesce(*(end_cols or start_cols)),
            )
        )
    if not domains:
        raise ValueError("no observation-period domain tables present")
    out = interval_summary(
        domains,
        key_name="person_id",
        start_name="observation_period_start_date",
        end_name="observation_period_end_date",
    )
    out = out.withColumn(
        "period_type_concept_id", F.lit(OBS_PERIOD_TYPE_CONCEPT_ID)
    )
    return assign_surrogate_ids(
        out, "observation_period_id", "person_id", mode=id_mode
    )


# --- era configurations (era.py) ---

CONDITION_ERA_GAP_DAYS = 30
DRUG_ERA_GAP_DAYS = 30


def derive_condition_era(condition_occurrence: DataFrame) -> DataFrame:
    """condition_era: end falls back to start + 1 day (era.py:25)."""
    co = condition_occurrence.withColumn(
        "__end",
        F.coalesce(
            F.col("condition_end_date"), F.date_add(F.col("condition_start_date"), 1)
        ),
    )
    return derive_eras(
        co,
        partition_keys=["person_id", "condition_concept_id"],
        start_col="condition_start_date",
        end_col="__end",
        gap_days=CONDITION_ERA_GAP_DAYS,
        era_start_name="condition_era_start_date",
        era_end_name="condition_era_end_date",
        count_name="condition_occurrence_count",
    )


def derive_drug_era(
    drug_exposure: DataFrame,
    concept: DataFrame,
    concept_ancestor: DataFrame,
    concept_class: str = "Ingredient",
) -> DataFrame:
    """drug_era: RxNorm rollup (Ingredient, or 'Clinical Drug Form' for
    the SCDF variant — era.py:148-153, 276-281), end-date fallback chain
    (era.py:146), 30-day gap."""
    rolled = rollup_hierarchy(
        drug_exposure,
        fk_col="drug_concept_id",
        ancestor=concept_ancestor,
        descendant_col="descendant_concept_id",
        ancestor_col="ancestor_concept_id",
        dim=concept,
        dim_key="concept_id",
        dim_filter=(F.col("vocabulary_id") == "RxNorm")
        & (F.col("concept_class_id") == concept_class),
        out_col="ingredient_concept_id",
    )
    rolled = rolled.withColumn(
        "__end",
        F.coalesce(
            F.col("drug_exposure_end_date"),
            F.expr("date_add(drug_exposure_start_date, days_supply)"),
            F.date_add(F.col("drug_exposure_start_date"), 1),
        ),
    )
    out = derive_eras(
        rolled,
        partition_keys=["person_id", "ingredient_concept_id"],
        start_col="drug_exposure_start_date",
        end_col="__end",
        gap_days=DRUG_ERA_GAP_DAYS,
        era_start_name="drug_era_start_date",
        era_end_name="drug_era_end_date",
        count_name="drug_exposure_count",
    )
    return out.withColumn("gap_days", F.lit(DRUG_ERA_GAP_DAYS)).withColumnRenamed(
        "ingredient_concept_id", "drug_concept_id"
    )
