"""Incremental/streaming variants of the derivation operators.

The reference is strictly batch — its "sync" jobs recompute derived
tables wholesale per data cycle (reference:
pedsnetdcc/sync_observation_period.py; SURVEY.md §2.10 records that no
streaming surface exists to port).  These operators are the documented
*extensions*: the same derivations expressed over Structured Streaming
so a continuously-loaded lake maintains them incrementally instead of
re-deriving per cycle.

Each builder takes a streaming DataFrame (``spark.readStream...``) and
returns the transformed streaming DataFrame; callers attach the sink
(``writeStream`` + trigger).  All of them also accept a *batch*
DataFrame and produce identical results — the logic is mode-agnostic,
which is how the tests pin streaming output to the batch oracle.

Scale notes: state is keyed per entity (person/user), so it shards
across executors with the shuffle; watermarks bound state growth for
the windowed/session aggregations.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def streaming_interval_summary(
    df: DataFrame,
    key: str,
    start_expr: Column | str,
    end_expr: Column | str,
    key_name: str = "person_id",
    start_name: str = "period_start",
    end_name: str = "period_end",
) -> DataFrame:
    """Incremental observation-period maintenance: running per-entity
    min/max event time (the batch operator recomputes this wholesale —
    operators/interval_summary.py; here the aggregation state carries
    it forward).  Use output mode ``update``/``complete``."""
    s = F.col(start_expr) if isinstance(start_expr, str) else start_expr
    e = F.col(end_expr) if isinstance(end_expr, str) else end_expr
    return df.groupBy(F.col(key).alias(key_name)).agg(
        F.min(s).alias(start_name),
        F.coalesce(F.max(e), F.max(s)).alias(end_name),
    )


def streaming_event_counts(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    window_duration: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """Windowed event counts with a late-data watermark — the canonical
    watermark + windowed-agg shape; append-mode-capable, state pruned
    beyond the watermark horizon."""
    wm = df.withWatermark(ts_col, watermark)
    return (
        wm.groupBy(F.window(F.col(ts_col), window_duration).alias("win"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n_events",
        )
    )


def streaming_eras(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap: str = "30 days",
    watermark: str | None = "35 days",
) -> DataFrame:
    """Streaming sessionization — the era derivation for point events as
    a built-in ``session_window`` aggregation: a session (era) closes
    when the next event is more than ``gap`` past the last one.

    For instantaneous events this matches the batch era operator with a
    zero-duration end date; interval-valued events (end dates, days
    supply) still need the batch window formulation
    (operators/eras.py), which streaming can host via
    ``applyInPandasWithState`` if ever needed.
    """
    src = df.withWatermark(ts_col, watermark) if watermark else df
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), *keys)
        .agg(F.count(F.lit(1)).alias("era_event_count"))
        .select(
            *keys,
            F.col("sw.start").alias("era_start"),
            F.col("sw.end").alias("era_end"),
            "era_event_count",
        )
    )
