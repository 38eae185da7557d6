"""Generation diff: what changed between two versions of a table.

The reference's workflow is cycle-based — sites submit a fresh data
cycle and the DCC re-runs the transform pipeline (reference:
pedsnetdcc/transform_runner.py's backup/swap of the previous schema) —
but it has no tool to ANSWER "what changed since the last cycle".  The
lake mapping keeps the previous generation on disk (TableStore
``current`` / ``_backup``), so the question is one full-outer join:

- ``added``    key only in the new generation
- ``removed``  key only in the old generation
- ``changed``  key in both, any compared column different

Scale shape: each side reduces to ``(key, row signature)`` scan-side
(the signature is one xxhash64 over the compared columns, each paired
with its is-null flag — Spark's hash SKIPS null inputs, so without the
flags ``(a, NULL)`` and ``(a,)`` would collide and a value→NULL edit
would read as unchanged); the join shuffles only those slim columns,
never the payload.  Unchanged rows — the overwhelming majority of a
real cycle — are dropped before anything is returned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_signature(df: DataFrame, cols: list[str]):
    if not cols:
        # key-only table: presence + the duplicate count classify
        return F.lit(0).cast("long")
    parts = []
    for c in cols:
        parts.append(F.col(c))
        parts.append(F.col(c).isNull())
    return F.xxhash64(*parts)


def diff_tables(
    new: DataFrame,
    old: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Classify every key that differs between ``old`` and ``new`` as
    ``added`` / ``removed`` / ``changed``; unchanged keys are dropped.

    ``compare_cols`` defaults to the non-key columns the two schemas
    share (sorted for a stable signature).  Returns ``key_cols +
    change string``.  Keys are assumed unique per side (the published
    tables' PK); duplicate keys compare as multisets of signatures via
    an order-free exact SUM fold (decimal(38,0) — wide enough for
    ~10^10 rows of 64-bit hashes, and unlike XOR it does not cancel
    even multiplicities: {A,A,B,B} vs {A,A,A,A} reads ``changed``).
    """
    if compare_cols is None:
        shared = set(new.columns) & set(old.columns)
        compare_cols = sorted(shared - set(key_cols))

    def slim(df: DataFrame) -> DataFrame:
        # SUM (exact, decimal) not XOR: XOR cancels even multiplicities,
        # so a duplicated key's {A,A,B,B} vs {A,A,A,A} would fold to
        # equal (0) signatures and misread as unchanged.
        sig = _row_signature(df, compare_cols).cast("decimal(38,0)")
        return df.groupBy(*key_cols).agg(
            F.sum(sig).alias("__sig"),
            F.count(F.lit(1)).alias("__n"),
        )

    n, o = slim(new).alias("n"), slim(old).alias("o")
    cond = [F.col(f"n.{k}").eqNullSafe(F.col(f"o.{k}")) for k in key_cols]
    j = n.join(o, cond, "full_outer")
    # presence is judged on the count column (never null on a present
    # side), not the key (a legitimately-null key value would misread)
    change = (
        F.when(F.col("o.__n").isNull(), F.lit("added"))
        .when(F.col("n.__n").isNull(), F.lit("removed"))
        .when(
            (F.col("n.__sig") != F.col("o.__sig"))
            | (F.col("n.__n") != F.col("o.__n")),
            F.lit("changed"),
        )
    )
    keys = [
        F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in key_cols
    ]
    return j.select(*keys, change.alias("change")).where(
        F.col("change").isNotNull()
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """Per-change counts of a :func:`diff_tables` result (the cycle
    report a DCC publishes next to the refresh)."""
    return diff.groupBy("change").agg(F.count(F.lit(1)).alias("n_keys"))


def diff_previous_generation(
    spark, store, name: str, key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Diff a TableStore table's published generation against its
    ``_backup`` generation (the one `undo` would restore)."""
    import os

    cur = store.read(spark, name)
    prev_path = os.path.join(store.backup_dir, name)
    prev = spark.read.parquet(prev_path)
    return diff_tables(cur, prev, key_cols, compare_cols)
