"""Anthropometric derivations — native reimplementation of the
reference's external Perl tools ``derive_bmi`` / ``derive_z``.

The Perl source is out-of-repo; only invocation configs exist in the
reference (SURVEY.md §2.11 X3), so these are new implementations
matching the documented configuration, not ports:

- BMI: pair each weight measurement (concept 3013762) with the nearest
  height measurement (concept 3023540) of the same person within
  ``meas_match_limit_sec`` (default 5,184,000 s = 60 days,
  reference: pedsnetdcc/bmi.py:34,267-273), compute
  ``weight_kg / (height_cm/100)^2`` and emit measurement-shaped rows
  with concept 3038553 / type 45754907 (bmi.py:12, z_score config at
  z_score.py:26-56).
- z-scores: LMS growth-chart standardization (NHANES_2000/CDC
  methodology, z_score.py:26-122 configs: BMI-for-age → 2000000043,
  height-for-age → 2000000042, weight-for-age → 2000000041):
  ``z = ((value/M)^L - 1) / (L*S)`` for L ≠ 0, ``ln(value/M)/S`` for
  L = 0, with (L, M, S) looked up per (measure, sex, age-month).

Spark shape:

- the pairing is a generic **as-of match** (``asof_match_nearest``):
  interleave left/right event streams per key, one window pass computes
  the previous and the next right-side timestamp for every left row,
  and the nearer one within tolerance wins (ties → earlier).  One
  shuffle on the key, no self-join, no UDF — this is the idiomatic
  replacement for the reference tool's per-person chunked loop
  (1000-person chunks, bmi.py:30-31).
- the LMS lookup is a broadcast join against the small reference table
  followed by native column math.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_match_nearest(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    tolerance_sec: int,
    right_cols: dict[str, str],
    tie: str = "earlier",
    direction: str = "nearest",
) -> DataFrame:
    """For each left row, attach the matching right row within
    ``tolerance_sec``; unmatched left rows keep NULLs.  ``right_cols``
    maps right-side column → output name.  ``direction`` follows the
    pandas ``merge_asof`` convention: ``"nearest"`` (smallest absolute
    timestamp difference — the reference's BMI pairing), ``"backward"``
    (latest right row at-or-before the left row — the classic as-of
    join of trades⋈quotes / DuckDB ASOF JOIN, oracle-checked against
    it), or ``"forward"`` (earliest right row at-or-after).

    Tie on equal nearest distance goes to the earlier right row
    ("earlier") or the later one ("later").

    Implementation: union the two streams tagged by side, sort within
    key by (timestamp, side-tag); ``last(right, ignorenulls)`` over the
    preceding frame gives the previous right event, ``first`` over the
    following frame gives the next; pick the nearer admissible one.
    Both window passes share one hash partition on ``keys``.
    """
    keys = list(keys)
    rc_src = list(right_cols)
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(0))
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        *[F.col(c) for c in rc_src],
    )
    # two right events at the same instant would make the match depend
    # on sort-tie order (nondeterministic across runs/partitionings —
    # found by the hypothesis property test); reduce to one row per
    # (key, ts) taking the lexicographic-min payload
    r = (
        r.groupBy(*keys, "__ts")
        .agg(F.min(F.struct(*rc_src)).alias("__p"))
        .select(*keys, "__ts", *[F.col(f"__p.{c}").alias(c) for c in rc_src])
    )
    r = r.withColumn("__side", F.lit(1))

    # align schemas for the union: left carries its full row, right only
    # the key/ts/payload; missing columns are nulled on each side
    l_only = [c for c in l.columns if c not in r.columns]
    r_only = [c for c in r.columns if c not in l.columns]
    for c in r_only:
        l = l.withColumn(c, F.lit(None).cast(r.schema[c].dataType))
    for c in l_only:
        r = r.withColumn(c, F.lit(None).cast(l.schema[c].dataType))
    ev = l.select(*sorted(l.columns)).unionByName(r.select(*sorted(r.columns)))

    tol_us = int(tolerance_sec) * 1_000_000
    # parquet writers may mark the event time as TIMESTAMP or
    # TIMESTAMP_NTZ (isAdjustedToUTC=false); unix_micros accepts only
    # the former.  The cast resolves NTZ in the session timezone —
    # pinned to UTC in session.build_session — so the epoch is
    # deterministic and identical for both encodings of the same data.
    ev = ev.withColumn("__tsl", F.unix_micros(F.col("__ts").cast("timestamp")))
    rv = lambda c: F.when(F.col("__side") == 1, F.col(c))  # noqa: E731

    # right events sort before left at identical timestamps so a
    # same-instant match is visible in the "previous" frame
    w = Window.partitionBy(*keys).orderBy("__tsl", F.col("__side").desc())
    prev_f = w.rowsBetween(Window.unboundedPreceding, -1)
    next_f = w.rowsBetween(1, Window.unboundedFollowing)

    cols = {}
    for c in ["__tsl", *rc_src]:
        cols[f"__prev_{c}"] = F.last(rv(c), ignorenulls=True).over(prev_f)
        cols[f"__next_{c}"] = F.first(rv(c), ignorenulls=True).over(next_f)
    out = ev.withColumns(cols).filter(F.col("__side") == 0)

    d_prev = F.col("__tsl") - F.col("__prev___tsl")
    d_next = F.col("__next___tsl") - F.col("__tsl")
    prev_ok = F.col("__prev___tsl").isNotNull() & (d_prev <= tol_us)
    next_ok = F.col("__next___tsl").isNotNull() & (d_next <= tol_us)
    if direction == "backward":
        use_prev, use_next = prev_ok, F.lit(False)
    elif direction == "forward":
        # a same-instant right row sorts into the PREVIOUS frame (side
        # tie-order); at-or-after must still take it, at distance 0
        same_instant = prev_ok & (d_prev == 0)
        use_prev = same_instant
        use_next = next_ok & ~same_instant
    elif direction == "nearest":
        if tie == "earlier":
            use_prev = prev_ok & (~next_ok | (d_prev <= d_next))
        else:
            use_prev = prev_ok & (~next_ok | (d_prev < d_next))
        use_next = next_ok & ~use_prev
    else:
        raise ValueError(f"unknown direction {direction!r}")

    for src, out_name in right_cols.items():
        out = out.withColumn(
            out_name,
            F.when(use_prev, F.col(f"__prev_{src}")).when(
                use_next, F.col(f"__next_{src}")
            ),
        )
    out = out.withColumn(
        "__match_dist_us",
        F.when(use_prev, d_prev).when(use_next, d_next).cast("long"),
    )
    drop = (
        ["__ts", "__tsl", "__side"]
        + [f"__prev_{c}" for c in ["__tsl", *rc_src]]
        + [f"__next_{c}" for c in ["__tsl", *rc_src]]
        + r_only
    )
    return out.drop(*drop)


# concept ids from the reference tool configs (bmi.py / z_score.py)
HEIGHT_CONCEPT_ID = 3023540
WEIGHT_CONCEPT_ID = 3013762
BMI_CONCEPT_ID = 3038553
BMI_TYPE_CONCEPT_ID = 45754907
Z_TYPE_CONCEPT_ID = 45754907
Z_CONCEPT_IDS = {"weight": 2000000041, "height": 2000000042, "bmi": 2000000043}
MATCH_LIMIT_SEC = 5_184_000  # 60 days (bmi.py:34,267-273)


def derive_bmi(
    measurement: DataFrame,
    person_col: str = "person_id",
    concept_col: str = "measurement_concept_id",
    ts_col: str = "measurement_datetime",
    value_col: str = "value_as_number",
    match_limit_sec: int = MATCH_LIMIT_SEC,
) -> DataFrame:
    """Derive BMI rows: each weight paired with the person's nearest
    height within the match window; output keeps the weight row's
    identity columns with BMI concept/value substituted."""
    weights = measurement.filter(F.col(concept_col) == WEIGHT_CONCEPT_ID)
    heights = measurement.filter(F.col(concept_col) == HEIGHT_CONCEPT_ID).select(
        person_col, ts_col, F.col(value_col).alias("__height_cm")
    )
    paired = asof_match_nearest(
        weights,
        heights,
        keys=[person_col],
        left_ts=ts_col,
        right_ts=ts_col,
        tolerance_sec=match_limit_sec,
        right_cols={"__height_cm": "height_cm"},
    )
    matched = paired.filter(F.col("height_cm").isNotNull())
    # square via multiplication, not pow(x, 2.0): *, / are exactly
    # rounded under IEEE-754 so the value is bit-identical across
    # engines (the DuckDB oracle replays the same arithmetic); pow is
    # only ulp-accurate and implementation-defined for integer exponents
    h_m = F.col("height_cm") / F.lit(100.0)
    bmi = F.col(value_col) / (h_m * h_m)
    return (
        matched.withColumn(value_col, bmi)
        .withColumn(concept_col, F.lit(BMI_CONCEPT_ID))
        .withColumn("measurement_type_concept_id", F.lit(BMI_TYPE_CONCEPT_ID))
        .drop("height_cm", "__match_dist_us")
    )


def lms_z_score(
    df: DataFrame,
    lms_ref: DataFrame,
    join_keys: Sequence[str],
    value_col: str,
    out_col: str = "z_score",
    l_col: str = "L",
    m_col: str = "M",
    s_col: str = "S",
) -> DataFrame:
    """LMS standardization against a broadcast reference table:
    ``z = ((v/M)^L - 1)/(L*S)``; L = 0 degenerates to ``ln(v/M)/S``
    (CDC/NHANES growth-chart method — z_score.py:26-122 configures the
    same system the Perl tool used)."""
    ref = F.broadcast(lms_ref.select(*join_keys, l_col, m_col, s_col))
    out = df.join(ref, list(join_keys), "left")
    v, L, M, S = F.col(value_col), F.col(l_col), F.col(m_col), F.col(s_col)
    z = F.when(L == 0, F.log(v / M) / S).otherwise(
        (F.pow(v / M, L) - 1) / (L * S)
    )
    return out.withColumn(out_col, z).drop(l_col, m_col, s_col)
