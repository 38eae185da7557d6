"""The column-append transform chain.

The reference's ``Transform`` classes each rewrite a SELECT to append
columns — never remove them (reference: pedsnetdcc/abstract_transform.py:
48-86).  Here each transform is a function ``DataFrame -> DataFrame``;
a pipeline is ``reduce(lambda df, t: t(df), transforms, df)`` and
Catalyst analyzes/optimizes the composed plan (the reference has no
optimizer — it hands text SQL to Postgres; SURVEY.md §4).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pedsnetdcc_spark.functions.intervals import months_in_interval

Transform = Callable[[DataFrame], DataFrame]


def apply_transforms(df: DataFrame, transforms: Sequence[Transform]) -> DataFrame:
    """Compose a transform chain (reference:
    pedsnetdcc/transform_runner.py:38-99 ``_transform_select_sql``)."""
    return reduce(lambda acc, t: t(acc), transforms, df)


def with_literal_column(df: DataFrame, name: str, value: object) -> DataFrame:
    """Append a constant column — the SiteNameTransform analog
    (reference: pedsnetdcc/site_name_transform.py:30-32 adds
    ``'{site}'::varchar(32) AS site``)."""
    return df.withColumn(name, F.lit(value))


@dataclass(frozen=True)
class DimensionLookup:
    """One FK → dimension-attribute lookup.

    ``fk_col`` in the fact table joins ``dim_key`` in ``dim``; the
    dimension's ``dim_value`` column is appended as ``out_col``.
    """

    fk_col: str
    dim_value: str
    out_col: str


def with_dimension_names(
    df: DataFrame,
    dim: DataFrame,
    dim_key: str,
    lookups: Sequence[DimensionLookup],
    broadcast: bool = True,
) -> DataFrame:
    """Append one dimension attribute per FK column via aliased LEFT
    OUTER joins — the ConceptNameTransform analog (reference:
    pedsnetdcc/concept_name_transform.py:46-56 emits one
    ``LEFT OUTER JOIN concept AS concept_N`` per ``*_concept_id`` column,
    up to 9 aliases on one table in bmi.py:153-161).

    Scale: the dimension (OMOP ``concept``) is small relative to facts,
    so each join is a broadcast hash join — no shuffle of the fact table,
    N lookups stay in one stage.  Set ``broadcast=False`` for a large
    dimension to let AQE/sort-merge handle it.
    """
    out = df
    for i, lk in enumerate(lookups):
        d = dim.select(
            F.col(dim_key).alias(f"__dk_{i}"), F.col(lk.dim_value).alias(lk.out_col)
        )
        if broadcast:
            d = F.broadcast(d)
        out = out.join(d, out[lk.fk_col] == d[f"__dk_{i}"], "left").drop(f"__dk_{i}")
    return out


def with_interval_months(
    df: DataFrame,
    anchor_df: DataFrame,
    key: str,
    anchor_col: str,
    event_cols: Sequence[str],
    suffix: str = "_age_in_months",
    broadcast: bool = True,
) -> DataFrame:
    """Append ``<event_col>_age_in_months`` columns — the AgeTransform
    analog (reference: pedsnetdcc/age_transform.py:127-133 joins
    ``person`` on ``person_id`` and computes
    ``months_in_interval(person.birth_datetime, t.<col>)`` per configured
    column).

    ``anchor_df`` is the entity table carrying the birth/anchor
    timestamp; joined INNER on ``key`` like the reference.
    """
    a = anchor_df.select(F.col(key), F.col(anchor_col).alias("__anchor_ts"))
    if broadcast:
        a = F.broadcast(a)
    out = df.join(a, key, "inner")
    for c in event_cols:
        out = out.withColumn(c + suffix, months_in_interval(F.col("__anchor_ts"), F.col(c)))
    return out.drop("__anchor_ts")


def recompute_column(
    df: DataFrame,
    updates: DataFrame,
    key: str | Sequence[str],
    col: str,
    update_col: str | None = None,
) -> DataFrame:
    """Join-and-overwrite: the correlated-UPDATE pattern
    (``UPDATE t SET col = sub.col FROM sub WHERE t.id = sub.id``,
    reference: pedsnetdcc/era.py:392-418, bmi.py:72-128,
    transform_runner.py:783-806).

    Spark has no in-place update; this is a left join plus
    ``coalesce(new, old)`` producing the rewritten table — a full-table
    rewrite, linear not quadratic (SURVEY.md §7 "what's hard").
    """
    update_col = update_col or col
    keys = [key] if isinstance(key, str) else list(key)
    upd = updates.select(*keys, F.col(update_col).alias("__upd"))
    out = df.join(upd, keys, "left")
    return out.withColumn(col, F.coalesce(F.col("__upd"), F.col(col))).drop("__upd")


def classifier_case(col: Column | str, domains: dict[str, Sequence[object]], default: str) -> Column:
    """CASE over membership sets — the partition-routing trigger's
    dispatch expression (reference: pedsnetdcc/partition_measurement.py:
    26-43 routes on ``measurement_concept_id`` IN-lists)."""
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for name, ids in domains.items():
        cond = c.isin(list(ids))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    assert expr is not None
    return expr.otherwise(F.lit(default))
