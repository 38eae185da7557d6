"""Constraint validation — PKs, NOT NULLs, FKs as checking operators.

The reference issues ``ALTER TABLE`` DDL for primary keys, NOT NULL,
and foreign keys after each build (reference: pedsnetdcc/
primary_keys.py:19-40,71+, not_nulls.py:15-80, foreign_keys.py:18-44,
85+).  Parquet/Spark have no enforced constraints, so the engine maps
each to a validation pass (SURVEY.md §1 "Spark mapping"): PK →
uniqueness assertion, NOT NULL → null scan, FK → referential-integrity
anti-join (the same probe shape as check_fact_relationship).

Each check returns a small violations DataFrame (empty = constraint
holds) so callers can assert, quarantine, or log; `validate_table`
runs a TableSchema's full constraint set in one pass over the data.

Index DDL is a deliberate no-op in Spark (full-scan engine, SURVEY.md
§4); the reference's index column lists serve instead as clustering
advice, and its md5 index-name convention is kept for parity
(``make_index_name``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NAME_LIMIT = 30  # Oracle identifier limit (abstract_transform.py:128-149)


def make_index_name(table_name: str, column_name: str) -> str:
    """Reference-parity index naming (abstract_transform.py:128-149):
    ``provider.gender_source_concept_name`` → ``pro_gscn_<md5>_ix`` —
    abbreviated names plus an md5 segment to dodge collisions within
    the 30-char Oracle limit."""
    table_abbrev = table_name[:3]
    column_abbrev = "".join(x[0] for x in column_name.split("_"))
    md5 = hashlib.md5(f"{table_name}.{column_name}".encode()).hexdigest()
    hashlen = NAME_LIMIT - (len(table_abbrev) + len(column_abbrev) + 3 + len("ix"))
    return "_".join([table_abbrev, column_abbrev, md5[:hashlen], "ix"])


def pk_violations(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Key groups appearing more than once: ``key_cols + [cnt]``."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > 1)
    )


def not_null_violation_counts(
    df: DataFrame, cols: Sequence[str]
) -> DataFrame:
    """One row per column: ``(column, null_count)`` (not_nulls.py maps
    each non-nullable column to a SET NOT NULL; here a single aggregate
    pass counts violations for all columns at once)."""
    aggs = [
        F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in cols
    ]
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{c}', `{c}`" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) as (column, null_count)"
    )


def fk_violations(
    df: DataFrame, fk_col: str, ref: DataFrame, ref_col: str
) -> DataFrame:
    """Rows whose non-null FK has no referent (foreign_keys.py's ADD
    CONSTRAINT ≙ this anti-join probe)."""
    keys = ref.select(F.col(ref_col).alias("__rk")).distinct()
    return (
        df.where(F.col(fk_col).isNotNull())
        .join(keys, F.col(fk_col) == F.col("__rk"), "left_anti")
    )


def validate_table(
    df: DataFrame,
    schema,  # TableSchema
    refs: dict[str, DataFrame] | None = None,
) -> dict[str, int]:
    """Run a TableSchema's declared constraints; returns violation
    counts keyed by constraint name (empty dict values of 0 = clean)."""
    out: dict[str, int] = {}
    if schema.primary_key:
        out["pk:" + ",".join(schema.primary_key)] = pk_violations(
            df, schema.primary_key
        ).count()
    nn_cols = [f.name for f in schema.struct.fields if not f.nullable and f.name in df.columns]
    if nn_cols:
        for row in not_null_violation_counts(df, nn_cols).collect():
            out[f"notnull:{row['column']}"] = row["null_count"]
    for fk_col, ref_table, ref_col in schema.foreign_keys:
        if refs and ref_table in refs and fk_col in df.columns:
            out[f"fk:{fk_col}->{ref_table}.{ref_col}"] = fk_violations(
                df, fk_col, refs[ref_table], ref_col
            ).count()
    return out
