"""Interval arithmetic: the reference's ``months_in_interval`` family.

The reference installs four SQL functions into Postgres (reference:
pedsnetdcc/age_transform.py:10-46) and uses ``months_in_interval(birth,
event)`` to derive ``*_age_in_months`` columns on eight tables.  Its
semantics are NOT Spark's ``months_between`` (which uses a fixed 31-day
month): fractional months are ``days / days_in_last_month_of_interval``
where the denominator is the length in days of the *actual* month the
interval ends in, computed as ``(t1 + (m+1) months) - (t1 + m months)``.

This implementation is a pure native column expression (JVM-side, stays
inside whole-stage codegen — no UDF):

    m      = whole calendar months from t1 to t2 (borrowing one month
             when t2's day-of-month/time-of-day precedes t1's)
    anchor = add_months(t1, m)           -- "last month of interval"
    result = m + datediff(t2, anchor) / datediff(add_months(t1, m+1), anchor)

Both numerator and denominator use the same ``t1 + k months`` anchor
arithmetic the reference's ``last_month_of_interval`` /
``month_after_last_month_of_interval`` functions use.  Known delta vs
Postgres, documented for honesty: for month-end start dates (e.g. Jan 31
→ Mar 30) Postgres ``age()`` computes the day remainder with its own
borrow convention (days of the month preceding t2) which can differ by a
couple of days in the numerator; the anchor form used here is
self-consistent, monotonic in t2, and matches Postgres for all
non-month-end-clamped starts.  Bit-exactness is unverifiable without a
live Postgres (the reference repo contains no fixture outputs for it).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def whole_months_between(start: Column | str, end: Column | str) -> Column:
    """Whole calendar months from ``start`` to ``end`` (may be negative).

    Borrows one month when the end's (day-of-month, time-of-day) precedes
    the start's — the same rule Postgres ``age()`` uses for its month
    component.
    """
    s, e = _to_col(start), _to_col(end)
    raw = (F.year(e) - F.year(s)) * 12 + F.month(e) - F.month(s)
    s_day, e_day = F.dayofmonth(s), F.dayofmonth(e)
    s_tod = F.unix_timestamp(s) - F.unix_timestamp(F.date_trunc("day", s))
    e_tod = F.unix_timestamp(e) - F.unix_timestamp(F.date_trunc("day", e))
    borrow = (e_day < s_day) | ((e_day == s_day) & (e_tod < s_tod))
    return raw - F.when(borrow, F.lit(1)).otherwise(F.lit(0))


def months_in_interval(start: Column | str, end: Column | str) -> Column:
    """Fractional months between two timestamps, reference semantics
    (pedsnetdcc/age_transform.py:33-36 ``months_in_interval``).

    Returns a DOUBLE.  Day-granular: sub-day remainders are dropped from
    the numerator exactly as the reference's ``extract(days from age(...))``
    drops them.
    """
    s, e = _to_col(start), _to_col(end)
    m = whole_months_between(s, e)
    anchor = F.add_months(s, m)  # last_month_of_interval
    next_anchor = F.add_months(s, m + 1)  # month_after_last_month_of_interval
    day_frac = F.datediff(e, anchor).cast("double") / F.datediff(next_anchor, anchor).cast(
        "double"
    )
    return (m.cast("double") + day_frac).cast("double")


def register_sql_functions(spark) -> None:
    """SQL-surface parity: install ``months_in_interval`` as a Spark SQL
    scalar function (the reference installs its SQL-function family into
    Postgres at pre-transform time, age_transform.py:10-46,72-82 —
    SURVEY.md §4 scopes 'one registered function at most').  A pure SQL
    function body (no UDF) — same anchor arithmetic as
    :func:`months_in_interval`, usable from ``spark.sql`` queries."""
    m = (
        "(YEAR(e) - YEAR(s)) * 12 + MONTH(e) - MONTH(s)"
        " - (CASE WHEN DAY(e) < DAY(s) THEN 1 ELSE 0 END)"
    )
    spark.sql(
        f"""
        CREATE OR REPLACE TEMPORARY FUNCTION months_in_interval(s DATE, e DATE)
        RETURNS DOUBLE
        RETURN (
          CAST(({m}) AS DOUBLE)
          + CAST(DATEDIFF(e, ADD_MONTHS(s, {m})) AS DOUBLE)
            / CAST(DATEDIFF(ADD_MONTHS(s, ({m}) + 1), ADD_MONTHS(s, {m})) AS DOUBLE)
        )
        """
    )


def months_in_interval_sql(start_expr: str, end_expr: str) -> str:
    """ANSI-SQL rendering of :func:`months_in_interval` runnable by both
    Spark SQL and DuckDB — used to build oracle queries.  Date-granular
    (casts both operands to DATE), which matches the engine semantics for
    date-typed inputs.
    """
    s, e = f"CAST({start_expr} AS DATE)", f"CAST({end_expr} AS DATE)"
    raw = f"((YEAR({e}) - YEAR({s})) * 12 + MONTH({e}) - MONTH({s}))"
    borrow = f"(CASE WHEN DAY({e}) < DAY({s}) THEN 1 ELSE 0 END)"
    m = f"({raw} - {borrow})"
    anchor = f"(({s}) + ({m}) * INTERVAL '1' MONTH)"
    next_anchor = f"(({s}) + (({m}) + 1) * INTERVAL '1' MONTH)"
    return (
        f"(CAST({m} AS DOUBLE) + CAST(DATEDIFF('day', {anchor}, {e}) AS DOUBLE)"
        f" / CAST(DATEDIFF('day', {anchor}, {next_anchor}) AS DOUBLE))"
    )
