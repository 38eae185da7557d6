"""Per-entity interval summary — the ``sync_observation_period`` analog.

The reference derives ``observation_period`` by unioning per-person
(min, max) event datetimes across seven domain tables, then taking the
overall min/max per person with null-max fallback to the min, a constant
period-type concept, and a ROW_NUMBER surrogate id (reference:
pedsnetdcc/sync_observation_period.py:8-83).

Scale: each domain aggregates map-side-partially before its shuffle;
the domain summaries are tiny (≤ one row per entity per domain), so the
final union + groupBy re-aggregation is cheap.  The ROW_NUMBER-over-
everything id synthesis in the reference (``row_number() over (range
unbounded preceding)``, sync_observation_period.py:78) is a single-task
bottleneck at scale — kept available for parity via ``ordered_id=True``,
but the id subsystem (operators/ids.py) is the scalable path.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interval_summary(
    domains: Sequence[tuple[DataFrame, str, Column | str, Column | str]],
    key_name: str = "person_id",
    start_name: str = "period_start",
    end_name: str = "period_end",
) -> DataFrame:
    """Union per-domain (entity, min, max) summaries into one overall
    interval per entity.

    ``domains`` is a sequence of ``(df, key_col, start_expr, end_expr)``;
    pass ``F.coalesce(datetime_col, date_col)`` expressions to mirror the
    reference's datetime-with-date-fallback convention
    (sync_observation_period.py:13-14).
    """

    def summarize(d: tuple[DataFrame, str, Column | str, Column | str]) -> DataFrame:
        df, key, start, end = d
        s = F.col(start) if isinstance(start, str) else start
        e = F.col(end) if isinstance(end, str) else end
        out = df.groupBy(F.col(key).alias(key_name)).agg(
            F.min(s).alias("__min"), F.max(e).alias("__max")
        )
        # fill_null_maxes: a null domain max falls back to the domain min
        # (sync_observation_period.py:57-60)
        return out.withColumn("__max", F.coalesce("__max", "__min"))

    limits = reduce(DataFrame.unionByName, (summarize(d) for d in domains))
    return limits.groupBy(key_name).agg(
        F.min("__min").alias(start_name),
        F.coalesce(F.max("__max"), F.max("__min")).alias(end_name),
    )


def with_ordered_id(
    df: DataFrame, order_col: str, id_name: str, base: int = 0
) -> DataFrame:
    """Append a contiguous 1-based surrogate id by global order —
    the reference's ``row_number() over (...)`` id synthesis
    (sync_observation_period.py:67-78; era.py:121-123).

    WARNING: a global window is a single-task sort at scale; use
    :func:`pedsnetdcc_spark.operators.ids.assign_surrogate_ids` (range
    reservation + per-partition offsets) for 100 TB runs.  This form is
    kept because several reference outputs are defined by it.
    """
    w = Window.orderBy(order_col)
    return df.withColumn(id_name, F.row_number().over(w) + F.lit(base))
