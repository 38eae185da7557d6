"""Era derivation (gaps-and-islands sessionization).

The reference builds ``condition_era`` / ``drug_era`` / ``drug_scdf_era``
with the classic OHDSI SQL-92 construction: interleave start events and
gap-padded end events, number them with two ROW_NUMBER windows, detect
era ends where ``2*start_ordinal - overall_ord = 0`` via an inequality
self-join + running MAX, then assign each occurrence to the minimum era
end ≥ its start (reference: pedsnetdcc/era.py:16-134 condition,
135-258 drug, 259-385 SCDF; 30-day gap at era.py:35,66-69,161,192-195).

That self-join is an artifact of pre-window SQL.  The idiomatic (and
shuffle-minimal) Spark formulation is a single pass:

    1. one window over (partition_keys) ordered by start: running max of
       the coalesced end date over preceding rows;
    2. new-era flag where start > prev_max_end + gap_days;
    3. cumulative sum of the flag = era id;
    4. groupBy(partition_keys, era_id) → min(start), max(end), count.

Equivalence to the reference construction (proved by the DuckDB oracle
in ``__spark_entry__.py`` which runs the reference's own 2*s-o=0 SQL):
an era end event at balance point is the maximum padded end seen, so an
era's end date is the max coalesced end in its island; a start joins an
island iff start <= max_prev_end + gap (the reference orders start
events before end events on date ties, so equality does not break).

Scale: exactly ONE shuffle — the hash partition on ``partition_keys``
for the window; the subsequent groupBy on (keys, era_id) reuses that
partitioning (HashPartitioning on a key subset satisfies the clustered
distribution), so no second exchange.  Per-key data is streamed sorted;
no self-join, no O(n²) per person-concept.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def derive_eras(
    df: DataFrame,
    partition_keys: Sequence[str],
    start_col: str,
    end_col: Column | str,
    gap_days: int = 30,
    era_start_name: str = "era_start_date",
    era_end_name: str = "era_end_date",
    count_name: str = "era_count",
) -> DataFrame:
    """Collapse dated occurrences into eras separated by > ``gap_days``.

    ``end_col`` may be a Column expression handling end-date fallbacks,
    e.g. the reference's ``COALESCE(end, start + days_supply, start + 1)``
    (pedsnetdcc/era.py:146) — pass
    ``F.coalesce("end", F.expr("date_add(start, days_supply)"),
    F.date_add("start", 1))``.

    Returns one row per era: ``partition_keys + [era_start, era_end,
    count]`` where era_end is the max coalesced end in the island
    (reference unpads its padded end dates to the same value,
    era.py:36-38).
    """
    keys = list(partition_keys)
    end_expr = F.col(end_col) if isinstance(end_col, str) else end_col
    ev = df.select(
        *keys,
        F.col(start_col).alias("__start"),
        end_expr.alias("__end"),
    )
    w = Window.partitionBy(*keys).orderBy("__start", "__end")
    prev_max_end = F.max("__end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    is_new = F.when(
        prev_max_end.isNull()
        | (F.col("__start") > F.date_add(prev_max_end, gap_days)),
        F.lit(1),
    ).otherwise(F.lit(0))
    ev = ev.withColumn(
        "__era_id", F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        ev.groupBy(*keys, "__era_id")
        .agg(
            F.min("__start").alias(era_start_name),
            F.max("__end").alias(era_end_name),
            # distinct start dates, not occurrences: the reference's
            # cteEnds GROUP BY (person, concept, start_date) collapses
            # duplicate starts before the final COUNT(*) (era.py:95-133)
            F.countDistinct("__start").alias(count_name),
        )
        .drop("__era_id")
    )


def rollup_hierarchy(
    df: DataFrame,
    fk_col: str,
    ancestor: DataFrame,
    descendant_col: str,
    ancestor_col: str,
    dim: DataFrame,
    dim_key: str,
    dim_filter: Column | None = None,
    out_col: str = "rollup_concept_id",
) -> DataFrame:
    """Map a detail-level code to its hierarchy ancestor — the drug →
    RxNorm-ingredient rollup feeding drug-era derivation (reference:
    pedsnetdcc/era.py:148-153: ``JOIN concept_ancestor ON
    descendant_concept_id = drug_concept_id JOIN concept ON
    ancestor_concept_id = concept_id WHERE vocabulary_id='RxNorm' AND
    concept_class_id='Ingredient'``).

    Scale: both the ancestor closure and the (filtered) dimension are
    vocabulary tables — small versus the fact table — so both joins are
    broadcast; the filter on the dimension is applied before the
    broadcast so only qualifying ancestors ship.
    """
    d = dim.filter(dim_filter) if dim_filter is not None else dim
    d = d.select(F.col(dim_key).alias("__anc_key"))
    closure = ancestor.select(
        F.col(descendant_col).alias("__desc"), F.col(ancestor_col).alias(out_col)
    )
    closure = closure.join(F.broadcast(d), closure[out_col] == d["__anc_key"]).drop(
        "__anc_key"
    )
    return df.join(F.broadcast(closure), df[fk_col] == closure["__desc"], "inner").drop(
        "__desc"
    )
