"""Table profiling — the engine-side statistics pass.

The reference's statistics surface is ``VACUUM ANALYZE`` after loads
(reference: pedsnetdcc/utils.py:295-388 — planner stats only, opaque to
the user).  Spark's cost-based stats analog is ``ANALYZE TABLE`` /
``sources/io.analyze_table``; this operator is the *user-facing*
profile a data pipeline wants before/after a load: per-column row,
null, and distinct counts.

Scale: ONE scan of the table.  All columns' aggregates run in a single
``agg`` (multiple DISTINCT aggregates plan as one pass over an Expand —
rows × columns intermediates, still one read of the data and map-side
partial aggregation), and the single result row is unpivoted with
``stack`` — no per-column re-scans, no driver loop over actions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    approx_distinct: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """One row per profiled column: ``(column, n_rows, n_null,
    n_distinct)``.  ``n_distinct`` is exact and excludes nulls (SQL
    ``COUNT(DISTINCT c)`` semantics); ``n_null = n_rows − COUNT(c)``.

    ``approx_distinct=True`` swaps every distinct count for
    HyperLogLog++ (``approx_count_distinct`` at relative error ``rsd``)
    — the 100 TB mode: k exact DISTINCTs plan as an Expand producing
    rows × columns intermediates into the shuffle, while k HLL sketches
    are constant-size state aggregated map-side, so the profile costs
    one ordinary scan regardless of cardinality.  (Oracle-checked in
    exact mode; approx mode is tolerance-tested against it.)
    """
    names = list(cols) if cols is not None else list(df.columns)
    nd = (
        (lambda c: F.approx_count_distinct(c, rsd=rsd))
        if approx_distinct
        else F.countDistinct
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(names):
        aggs.append(F.count(F.col(c)).alias(f"__nn{i}"))
        aggs.append(nd(F.col(c)).alias(f"__nd{i}"))
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn{i}, __nd{i}" for i, c in enumerate(names)
    )
    return row.select(
        F.expr(
            f"stack({len(names)}, {stack_args}) AS (column, __notnull, n_distinct)"
        ),
        F.col("__n"),
    ).select(
        "column",
        F.col("__n").alias("n_rows"),
        (F.col("__n") - F.col("__notnull")).alias("n_null"),
        "n_distinct",
    )


_NUMERIC_DTYPES = {
    "tinyint", "smallint", "int", "bigint", "float", "double",
}


def numeric_profile(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    percentiles: Sequence[float] = (0.05, 0.5, 0.95),
    accuracy: int = 10_000,
) -> DataFrame:
    """Distribution profile of the numeric columns: one row per column
    with ``(n, n_null, mean, min, max, p<pct>...)`` — the value-range
    companion to :func:`profile_table`'s cardinality pass (the check a
    pipeline runs before/after a load to catch unit flips, overflow
    sentinels, and truncated loads that counts alone miss; the
    reference's only analog is opaque planner stats via ANALYZE).

    Scale: ONE scan.  ``percentile_approx`` aggregates a mergeable
    rank-sketch (Greenwald-Khanna style) with map-side partial merge —
    state is O(accuracy) per column regardless of row count, so the
    profile costs an ordinary scan at any scale; at the default
    accuracy the rank error is ≤ n/10000.  Decimal columns are cast to
    double scan-side (one stack output type).  Non-numeric ``cols``
    raise.
    """
    if cols is None:
        names = [c for c, t in df.dtypes
                 if t in _NUMERIC_DTYPES or t.startswith("decimal")]
    else:
        names = list(cols)
        bad = [
            c for c, t in df.dtypes
            if c in names and t not in _NUMERIC_DTYPES
            and not t.startswith("decimal")
        ]
        if bad:
            raise ValueError(f"non-numeric columns in numeric_profile: {bad}")
    if not names:
        raise ValueError("no numeric columns to profile")
    pcts = list(percentiles)
    pct_arr = F.array(*[F.lit(float(p)) for p in pcts])
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(names):
        v = F.col(c).cast("double")
        aggs.append(F.count(v).alias(f"__nn{i}"))
        aggs.append(F.avg(v).alias(f"__mean{i}"))
        aggs.append(F.min(v).alias(f"__min{i}"))
        aggs.append(F.max(v).alias(f"__max{i}"))
        aggs.append(
            F.percentile_approx(v, pct_arr, accuracy).alias(f"__p{i}")
        )
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn{i}, __mean{i}, __min{i}, __max{i}, __p{i}"
        for i, c in enumerate(names)
    )
    out = row.select(
        F.expr(
            f"stack({len(names)}, {stack_args}) AS "
            "(column, __notnull, mean, min, max, __ps)"
        ),
        F.col("__n"),
    )
    pct_cols = [
        F.col("__ps").getItem(i).alias(f"p{str(p).replace('.', '_')}")
        for i, p in enumerate(pcts)
    ]
    return out.select(
        "column",
        F.col("__n").alias("n_rows"),
        (F.col("__n") - F.col("__notnull")).alias("n_null"),
        "mean", "min", "max", *pct_cols,
    )


def heavy_hitters(
    df: DataFrame, key_col: str, k: int = 10, capacity: int = 4096
) -> DataFrame:
    """EXACT top-k heavy hitters with bounded intermediate state — the
    ultra-high-cardinality twin of :func:`key_skew_profile` (whose
    groupBy shuffles one row per DISTINCT key: fine for join keys,
    hostile when profiling a free-text or id column with billions of
    distincts).

    Two passes, Misra-Gries-style candidates + exact verify:

    1. Each partition maintains a Misra-Gries summary of ``capacity``
       counters (the batch-merge formulation: add the Arrow batch's
       value_counts, then subtract the (capacity+1)-th largest counter
       and drop non-positives — one vectorized pandas pass per batch,
       memory ≤ capacity + one batch's distincts).  MG guarantee: any
       value with partition frequency > n_p/capacity survives, so the
       cross-partition union is a guaranteed superset of every value
       with GLOBAL share > 1/capacity, whatever the partitioning.
    2. The candidate union (≤ partitions × capacity slim rows)
       broadcast-filters a second scan that counts ONLY candidates
       exactly; top-k of those counts.

    The result equals :func:`key_skew_profile`'s top-k whenever the
    k-th true count exceeds ``n/capacity`` (the returned ``share``
    makes the check visible: ranks with ``share > 1/capacity`` are
    unconditionally exact).  Output schema matches key_skew_profile:
    ``(key, n, rank, share)``.
    """
    from pyspark.sql import Window
    from pyspark.sql.types import StringType, StructField, StructType

    src = df.select(F.col(key_col).cast("string").alias("key"))
    part_schema = StructType([StructField("key", StringType())])

    def mg_per_partition(batches):
        import pandas as pd

        summary: "pd.Series | None" = None
        for pdf in batches:
            c = pdf["key"].value_counts(dropna=False)
            summary = c if summary is None else summary.add(c, fill_value=0)
            if len(summary) > capacity:
                kth = summary.nlargest(capacity + 1).iloc[-1]
                summary = summary[summary > kth] - kth
        if summary is None or not len(summary):
            return
        yield pd.DataFrame({"key": summary.index.astype(object)})

    candidates = (
        src.mapInPandas(mg_per_partition, schema=part_schema).distinct()
    )
    counts = (
        # null-safe equality so a null-heavy key is counted like
        # key_skew_profile's groupBy would count it
        src.join(
            F.broadcast(candidates.withColumnRenamed("key", "__ck")),
            F.col("key").eqNullSafe(F.col("__ck")),
        )
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = src.agg(F.count(F.lit(1)).alias("__total"))
    top = counts.orderBy(F.col("n").desc(), F.col("key")).limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col("key"))
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select(
            "key",
            F.col("n").cast("long").alias("n"),
            "rank",
            (F.col("n").cast("double") / F.col("__total").cast("double")).alias(
                "share"
            ),
        )
    )


def key_skew_profile(df: DataFrame, key_col: str, k: int = 10) -> DataFrame:
    """Heavy-hitter profile of a join/aggregation key: the ``k`` most
    frequent key values with their exact counts and share of all rows —
    ``(key, n, rank, share)``.  This is the pre-join skew diagnostic
    for the salting / AQE-skew-join decision (a key holding >1% of a
    100 TB table funnels >1 TB through one task in a plain hash join);
    the reference's ANALYZE-driven planner stats play the same role for
    Postgres (utils.py:343-388).

    Scale shape: one partial-aggregated groupBy on the key, then a
    distributed ``orderBy(...).limit(k)`` (TakeOrdered — no global
    sort materialization), a 1-row total broadcast, and a rank window
    over the ≤k surviving rows (bounded, driver-scale).  Ties break on
    the key string so the ranking is deterministic.  ``share`` is an
    exact integer ratio in IEEE double (single division — engine-exact).
    """
    from pyspark.sql import Window

    counts = (
        df.groupBy(F.col(key_col).cast("string").alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("__total"))
    top = counts.orderBy(F.col("n").desc(), F.col("key")).limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col("key"))
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select(
            "key",
            F.col("n").cast("long").alias("n"),
            "rank",
            (F.col("n").cast("double") / F.col("__total").cast("double")).alias(
                "share"
            ),
        )
    )
