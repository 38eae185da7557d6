"""Interval overlap join with time-bucket candidate generation.

The reference's range joins (era end assignment, reference:
pedsnetdcc/era.py:95-110) carry an equi-key (person, concept), so Spark
plans them as hash joins with a range filter — fine.  The GENERAL
interval-overlap join (no selective equi-key) is the case OSS Spark
handles badly: a bare range predicate plans as BroadcastNestedLoopJoin,
O(n·m) pair evaluations.  This operator applies the standard temporal
binning remedy:

1. choose a bucket width; explode each interval into the time buckets
   it covers (scan-side ``sequence`` + ``explode``, no shuffle);
2. equi-join on (keys…, bucket) — candidates are bucket-local, cost
   Σ per-bucket l·r instead of n·m;
3. emit a pair only from the bucket containing the OVERLAP START
   (``bucket == floor(max(l_start, r_start) / width)``) so each pair
   appears exactly once — no distinct pass;
4. verify the exact overlap predicate on the candidates.

Bucket-width tuning: ~the median interval length.  Too narrow → long
intervals explode into many buckets (row blowup is interval_len/width
per row); too wide → buckets collect unrelated intervals (candidate
blowup).  Both failure modes degrade gracefully and the exact verify
keeps the result correct regardless.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Pairs of (left, right) rows with the same ``keys`` whose
    ``[start, end]`` timestamp intervals overlap (inclusive bounds):
    ``l_start <= r_end AND r_start <= l_end``.  Non-key columns are
    prefixed ``l_``/``r_`` in the output.

    ``how="inner"`` returns matching pairs; ``how="left_semi"`` keeps
    left rows with at least one overlap (dedup-free by construction is
    only true for inner — semi uses a distinct on the left key set).
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"unsupported how {how!r}")
    keys = list(keys)
    w_us = int(bucket_seconds) * 1_000_000

    def bucketed(df: DataFrame, start: str, end: str, side: str) -> DataFrame:
        s_us = F.unix_micros(F.col(start).cast("timestamp"))
        e_us = F.unix_micros(F.col(end).cast("timestamp"))
        buckets = F.sequence(
            F.floor(s_us / w_us).cast("long"), F.floor(e_us / w_us).cast("long")
        )
        renames = {
            c: f"{side}_{c}" for c in df.columns if c not in keys
        }
        out = df.select(
            *keys,
            *[F.col(c).alias(n) for c, n in renames.items()],
            s_us.alias(f"__{side}_s"),
            e_us.alias(f"__{side}_e"),
            F.explode(buckets).alias("__bucket"),
        )
        return out

    lb = bucketed(left, l_start, l_end, "l")
    rb = bucketed(right, r_start, r_end, "r")
    cand = lb.join(rb, [*keys, "__bucket"])
    overlap_start_bucket = F.floor(
        F.greatest(F.col("__l_s"), F.col("__r_s")) / w_us
    ).cast("long")
    pairs = cand.where(
        (F.col("__bucket") == overlap_start_bucket)
        & (F.col("__l_s") <= F.col("__r_e"))
        & (F.col("__r_s") <= F.col("__l_e"))
    ).drop("__bucket", "__l_s", "__l_e", "__r_s", "__r_e")
    if how == "inner":
        return pairs
    left_key_cols = [*keys, *[c for c in pairs.columns if c.startswith("l_")]]
    return pairs.select(*left_key_cols).distinct()
