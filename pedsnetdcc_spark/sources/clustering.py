"""Data-layout clustering — the lake analog of the reference's index
lifecycle.

The reference creates per-column b-tree indexes after every load
(reference indexes.py:54-86 builds them from per-table column lists,
add_index_transform.py:5-42 / drop_index_transform.py:7-71 manage them
per transform) because Postgres point lookups need them.  A full-scan
engine gets the same selective-read effect from DATA LAYOUT instead:
sort rows into files on the lookup columns so parquet row-group
min/max statistics prune non-matching groups at scan time — the scan
reads footers, skips everything else.  ``clustered_write`` is the
``OPTIMIZE ZORDER`` / ``CLUSTER BY`` analog, and the reference's index
column lists are its ready-made clustering spec (SURVEY §4): the same
columns its DBA tuned for lookups are the ones a lake table should be
laid out by.

Scale shape: one range exchange (boundaries from a driver-side sample —
Spark's range partitioner) + a per-partition sort + the write.  Fully
parallel; no global sort task, no driver collection of data.  Cost is
the write job you were already paying, plus the exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The reference's most-used index column lists (indexes.py: per-table
# ``indexes`` maps), as clustering specs: leading column = the
# highest-selectivity lookup key (person_id everywhere in the CDM).
CLUSTER_SPECS: dict[str, list[str]] = {
    "condition_occurrence": ["person_id", "condition_concept_id", "condition_start_date"],
    "drug_exposure": ["person_id", "drug_concept_id", "drug_exposure_start_date"],
    "measurement": ["person_id", "measurement_concept_id", "measurement_date"],
    "observation": ["person_id", "observation_concept_id", "observation_date"],
    "visit_occurrence": ["person_id", "visit_concept_id", "visit_start_date"],
    "fact_relationship": ["fact_id_1", "fact_id_2"],
}


def clustered_write(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    num_files: int | None = None,
) -> None:
    """Write ``df`` clustered on ``cluster_cols``: range-partition on
    the column list (each output file covers a near-disjoint range of
    the leading column) and sort rows within every file by the full
    list, so row groups carry tight min/max statistics — the
    data-skipping precondition an equality or range predicate on the
    leading column needs to prune files/row groups at scan time.

    ``num_files`` sizes the layout (default: current shuffle
    parallelism).  Use through ``TableStore.stage``-style paths for
    atomic publish; this writer itself is plain overwrite.
    """
    cols = [F.col(c) for c in cluster_cols]
    if num_files is not None:
        ranged = df.repartitionByRange(num_files, *cols)
    else:
        ranged = df.repartitionByRange(*cols)
    ranged.sortWithinPartitions(*cols).write.mode("overwrite").parquet(path)


def leading_column_file_ranges(path: str, column: str) -> list[tuple[object, object]]:
    """Per-file (min, max) of ``column`` from the parquet footers —
    the statistics the scan's row-group pruning consults.  Driver-side
    metadata read (no data pages touched); used by tests to prove the
    clustered layout actually yields prunable, near-disjoint ranges."""
    import os

    import pyarrow.parquet as pq

    ranges: list[tuple[object, object]] = []
    for dirpath, _, files in os.walk(path):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            meta = pq.ParquetFile(os.path.join(dirpath, f)).metadata
            idx = meta.schema.names.index(column)
            mins, maxs = [], []
            for rg in range(meta.num_row_groups):
                stats = meta.row_group(rg).column(idx).statistics
                if stats is None or not stats.has_min_max:
                    continue
                mins.append(stats.min)
                maxs.append(stats.max)
            if mins:
                ranges.append((min(mins), max(maxs)))
    return ranges


def zorder_write(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    num_files: int | None = None,
    bits: int = 16,
) -> None:
    """Write ``df`` Z-ORDER clustered on ``cluster_cols``: each column
    is min-max normalized into a ``bits``-wide integer, the bits are
    interleaved into a Morton key, and files are range-partitioned +
    sorted on that key — so EVERY listed column gets tight per-file
    min/max ranges (a linear sort gives them only to the leading
    column).  This is the multi-column data-skipping layout of Delta's
    OPTIMIZE ZORDER, for tables queried by more than one lookup key
    (e.g. measurement by person_id AND by concept_id).

    One driver-side min/max aggregate sizes the normalization (a single
    1-row action over the write input — the writer is already an
    action), then one range exchange + per-partition sort, exactly like
    :func:`clustered_write`.  Columns must be numeric/date-castable;
    constant columns normalize to 0.

    The interleaved key lives in a signed 64-bit long, so the highest
    usable bit position is 62 (bit 63 is the sign — a key landing there
    would sort negative-first and scramble the layout, and positions
    ≥64 would silently wrap under the JVM's shift-mod-64).  ``bits`` is
    therefore auto-reduced so ``bits * len(cluster_cols) <= 62``; e.g.
    4 columns get 15 bits each, 8 columns get 7.  Per-column resolution
    beyond ~2^10 buckets adds nothing to file-level skipping anyway —
    file count, not key precision, bounds the pruning granularity.
    """
    cols = list(cluster_cols)
    if not cols:
        raise ValueError("zorder_write requires at least one cluster column")
    bits = min(bits, 62 // len(cols))
    if bits < 1:
        raise ValueError(
            f"too many cluster columns for a 64-bit Morton key: {len(cols)} > 62"
        )
    row = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).first()
    top = (1 << bits) - 1
    k = len(cols)
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        mn, mx = row[f"mn_{j}"], row[f"mx_{j}"]
        span = (mx - mn) if (mn is not None and mx is not None and mx > mn) else None
        if span is None:
            continue
        q = F.least(
            F.lit(top),
            F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * top).cast(
                "long"
            ),
        )
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(q, i).bitwiseAND(F.lit(1)), i * k + j
            )
    keyed = df.withColumn("__zorder", z)
    if num_files is not None:
        ranged = keyed.repartitionByRange(num_files, F.col("__zorder"))
    else:
        ranged = keyed.repartitionByRange(F.col("__zorder"))
    (
        ranged.sortWithinPartitions("__zorder")
        .drop("__zorder")
        .write.mode("overwrite")
        .parquet(path)
    )
