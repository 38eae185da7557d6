"""Incremental sync jobs: continuous maintenance of derived tables.

The reference's "sync" jobs recompute derived tables wholesale each
data cycle (reference: pedsnetdcc/sync_observation_period.py — TRUNCATE
+ re-INSERT of the per-person min/max observation period).  On a
continuously-loaded lake the same table can be maintained
INCREMENTALLY: each micro-batch folds its per-entity min/max into the
published table — O(batch + table) per cycle instead of O(all history),
and the events themselves never need to be retained for the derivation.

Built on ``foreachBatch``: the batch handler aggregates the new events,
merge-aggregates them with the current published table, and swaps the
result in atomically (``TableStore.replace``).  Running min/max is a
semilattice fold (commutative, associative, idempotent per value), so
the merged table equals the wholesale recomputation over all events
ever seen — pinned by tests against the batch operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pedsnetdcc_spark.sources.io import TableStore


def incremental_interval_sync(
    stream: DataFrame,
    store: TableStore,
    table: str,
    key: str,
    start_col: str,
    end_col: str,
    key_name: str = "person_id",
    start_name: str = "period_start",
    end_name: str = "period_end",
):
    """Return a ``DataStreamWriter`` (caller adds trigger/checkpoint and
    ``.start()``) that maintains ``store/current/<table>`` as the
    per-entity ``(min start, max end)`` over ALL events ever streamed.
    """

    def _sync(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        agg = batch_df.groupBy(F.col(key).alias(key_name)).agg(
            F.min(start_col).alias(start_name),
            F.coalesce(F.max(end_col), F.max(start_col)).alias(end_name),
        )
        # Existence is checked explicitly rather than by catching read
        # errors: the accumulated min/max history is NOT recoverable from
        # retained events (the module's whole point is that events need
        # not be kept), so a transient IO/schema error must fail the
        # micro-batch — Structured Streaming then retries it — instead of
        # being mistaken for "first batch" and wiping the table.
        if store.table_exists(table):
            cur = store.read(spark, table)
            merged = (
                cur.unionByName(agg)
                .groupBy(key_name)
                .agg(
                    F.min(start_name).alias(start_name),
                    F.max(end_name).alias(end_name),
                )
            )
        else:  # genuinely the first batch
            merged = agg
        store.replace(table, merged)

    return stream.writeStream.foreachBatch(_sync).outputMode("update")
