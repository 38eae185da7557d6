"""Cohort construction and cohort subsetting.

``distinct_cohort`` — the RECOVER-cohort pattern: union of DISTINCT key
projections from several filtered domain tables (reference:
pedsnetdcc/recover_cohort.py:15-201 builds the cohort from six
domain queries, each ``SELECT DISTINCT person_id … WHERE concept_id IN
(…)``, plus a visit date-range predicate at recover_cohort.py:69).

``subset_by_cohort`` — the subset pipeline: every table is reduced to
rows whose key appears in the cohort via a semi join (reference:
pedsnetdcc/subset_by_cohort.py:150-159 joins each table to the cohort on
person_id; fact_relationship keeps rows whose referenced fact survives,
subset_by_cohort.py:197-205 — the EXISTS pattern).

Scale: the cohort is a key list — small versus facts — so the semi join
broadcasts: no shuffle of the fact tables at all.  ``distinct`` per
domain aggregates partially map-side before its shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_cohort(
    domains: Sequence[tuple[DataFrame, str, Column | None]],
    key_name: str = "person_id",
) -> DataFrame:
    """Union-dedup of distinct keys from filtered domain tables.

    ``domains``: sequence of ``(df, key_col, filter_expr_or_None)``.
    """

    def keys(d: tuple[DataFrame, str, Column | None]) -> DataFrame:
        df, key, flt = d
        if flt is not None:
            df = df.filter(flt)
        return df.select(F.col(key).alias(key_name))

    return reduce(DataFrame.unionByName, (keys(d) for d in domains)).distinct()


def subset_by_cohort(
    df: DataFrame, cohort: DataFrame, key: str, cohort_key: str | None = None
) -> DataFrame:
    """Keep rows whose ``key`` appears in the cohort (semi join,
    broadcast — subset_by_cohort.py:150-159)."""
    ck = cohort_key or key
    c = cohort.select(F.col(ck).alias(key)).distinct()
    return df.join(F.broadcast(c), key, "left_semi")


def subset_polymorphic(
    fact: DataFrame,
    domain_col: str,
    fact_id_col: str,
    domains: Sequence[tuple[int, DataFrame, str]],
) -> DataFrame:
    """fact_relationship subset: keep rows whose (domain, fact id)
    EXISTS in the corresponding already-subsetted domain table — the
    reference ORs one EXISTS per domain over fact_id_1
    (subset_by_cohort.py:197-205: visit 8, drug 13, measurement 21,
    observation 27); rows of unchecked domains drop out.

    ``domains``: sequence of ``(domain_code, subsetted_table, pk_col)``.
    Spark shape: ONE scan of the fact table — the per-domain key sets
    are tagged with their domain code, unioned into a single
    ``(code, key)`` table, and a single composite-key left-semi join
    keeps the matching rows; rows of unchecked domains match no key and
    drop out.  (A per-domain filter + semi join + union reads the fact
    table — the biggest input — once per domain; at scale that triples
    the IO for the standard three-domain configuration.)  The key side
    is distinct per domain (small parallel shuffles of slim
    projections) and typically broadcasts under AQE.
    """
    keys = reduce(
        DataFrame.unionByName,
        [
            tbl.select(
                F.lit(code).alias("__dom"), F.col(pk).alias("__pk")
            ).distinct()
            for code, tbl, pk in domains
        ],
    )
    cond = (fact[domain_col] == keys["__dom"]) & (fact[fact_id_col] == keys["__pk"])
    return fact.join(keys, cond, "left_semi")
