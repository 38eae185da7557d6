"""Interval arithmetic: the reference's ``months_in_interval`` family,
bit-exact to its Postgres implementation.

The reference installs four SQL functions into Postgres (reference:
pedsnetdcc/age_transform.py:10-46) and uses ``months_in_interval(birth,
event)`` to derive ``*_age_in_months`` columns on eight tables:

    months_in_interval(t1, t2) =
        extract(years  from age(t2, t1)) * 12
      + extract(months from age(t2, t1))
      + extract(days   from age(t2, t1)) / days_in_last_month_of_interval(t1, t2)

Two Postgres conventions must be replicated exactly (both verified
against the documented behavior of ``timestamp_age`` in PostgreSQL's
``timestamp.c``):

1. **The day borrow uses the FIRST timestamp's month length.** ``age``
   subtracts field-wise (years, months, days, time); a negative day
   field borrows one month and adds ``day_tab[t1.month]`` — the number
   of days in t1's own calendar month — NOT the length of the month
   preceding t2.  (age('2001-03-10','2001-01-15') = 1 mon 26 days:
   -5 + 31 Jan days, not -5 + 28 Feb days.)  A negative time-of-day
   difference first borrows one day.  One month borrow always suffices:
   day_tab[t1.month] >= t1.day, so days + borrow >= t2.day >= 1.
2. **The denominator anchors clamp sequentially.** The reference's
   ``last_month_of_interval`` is ``t1 + (years) + (months)`` as two
   interval additions, each clamping month-ends independently:
   2000-02-29 + 1 year + 1 month = 2001-03-28, whereas a single
   13-month add gives 2001-03-29.  We therefore add the year and month
   components in two ``add_months`` steps.

A consequence the reference itself documents ("you should be able to
obtain the original timestamp ... with great difficulty"): the value is
NOT monotonic in t2 across month boundaries (Jan 15 → Mar 14 gives
1 + 30/28 ≈ 2.071, but Jan 15 → Mar 15 gives exactly 2.0).  We
replicate, not repair — the quirk is pinned by a test.

Everything is a pure native column expression (JVM-side, stays inside
whole-stage codegen — no UDF).  Defined for t2 >= t1 (the reference
only ever computes ages of events after birth); for t2 < t1 the
expression stays total and sign-symmetric in the month component but is
not bit-matched to Postgres' mirrored borrow branch.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def days_in_month(c: Column | str) -> Column:
    """Length in days of the calendar month containing ``c``."""
    return F.dayofmonth(F.last_day(_to_col(c)))


def _age_fields(s: Column, e: Column) -> tuple[Column, Column]:
    """Postgres ``age(e, s)`` total-month and day components (e >= s)."""
    m_raw = (F.year(e) - F.year(s)) * 12 + F.month(e) - F.month(s)
    s_tod = F.unix_timestamp(s) - F.unix_timestamp(F.date_trunc("day", s))
    e_tod = F.unix_timestamp(e) - F.unix_timestamp(F.date_trunc("day", e))
    day_borrow = F.when(e_tod < s_tod, F.lit(1)).otherwise(F.lit(0))
    day0 = F.dayofmonth(e) - F.dayofmonth(s) - day_borrow
    month_borrow = day0 < 0
    months = m_raw - F.when(month_borrow, F.lit(1)).otherwise(F.lit(0))
    days = day0 + F.when(month_borrow, days_in_month(s)).otherwise(F.lit(0))
    return months, days


def whole_months_between(start: Column | str, end: Column | str) -> Column:
    """Whole calendar months from ``start`` to ``end`` — the
    ``years*12 + months`` components of Postgres ``age(end, start)``."""
    m, _ = _age_fields(_to_col(start), _to_col(end))
    return m


def months_in_interval(start: Column | str, end: Column | str) -> Column:
    """Fractional months between two timestamps, bit-exact reference
    semantics (pedsnetdcc/age_transform.py:32-35 ``months_in_interval``).

    Returns a DOUBLE.  Day-granular: sub-day remainders are dropped from
    the numerator exactly as the reference's
    ``extract(days from age(...))`` drops them.
    """
    s, e = _to_col(start), _to_col(end)
    m, days = _age_fields(s, e)
    years = F.floor(m / 12).cast("int")
    mon = m - years * 12  # in [0, 12) for m >= 0
    base = F.add_months(s, years * 12)  # t1 + years  (clamp #1)
    last = F.add_months(base, mon)  # ... + months (clamp #2): last_month_of_interval
    nxt = F.add_months(base, mon + 1)  # month_after_last_month_of_interval
    denom = F.datediff(nxt, last).cast("double")
    return (m.cast("double") + days.cast("double") / denom).cast("double")


def register_sql_functions(spark) -> None:
    """SQL-surface parity: install ``months_in_interval`` as a Spark SQL
    scalar function (the reference installs its SQL-function family into
    Postgres at pre-transform time, age_transform.py:10-46,72-82 —
    SURVEY.md §4 scopes 'one registered function at most').  A pure SQL
    function body (no UDF) — same Postgres ``age()`` borrow + sequential
    anchor arithmetic as :func:`months_in_interval`."""
    m_raw = "((YEAR(e) - YEAR(s)) * 12 + MONTH(e) - MONTH(s))"
    day0 = "(DAY(e) - DAY(s))"
    m = f"({m_raw} - (CASE WHEN {day0} < 0 THEN 1 ELSE 0 END))"
    days = f"({day0} + (CASE WHEN {day0} < 0 THEN DAY(LAST_DAY(s)) ELSE 0 END))"
    years = f"(CAST(FLOOR({m} / 12) AS INT))"
    mon = f"({m} - {years} * 12)"
    base = f"ADD_MONTHS(s, {years} * 12)"
    last = f"ADD_MONTHS({base}, {mon})"
    nxt = f"ADD_MONTHS({base}, {mon} + 1)"
    spark.sql(
        f"""
        CREATE OR REPLACE TEMPORARY FUNCTION months_in_interval(s DATE, e DATE)
        RETURNS DOUBLE
        RETURN (
          CAST({m} AS DOUBLE)
          + CAST({days} AS DOUBLE) / CAST(DATEDIFF({nxt}, {last}) AS DOUBLE)
        )
        """
    )


def months_in_interval_sql(start_expr: str, end_expr: str) -> str:
    """DuckDB rendering of :func:`months_in_interval` — used to build the
    oracle side of correctness queries.  Date-granular (casts both
    operands to DATE), which matches the engine semantics for date-typed
    inputs.  Uses ``to_years``/``to_months`` so the two anchor additions
    clamp sequentially exactly like the reference's
    ``+ interval '1 year' * y + interval '1 month' * m``."""
    s, e = f"CAST({start_expr} AS DATE)", f"CAST({end_expr} AS DATE)"
    m_raw = f"((YEAR({e}) - YEAR({s})) * 12 + MONTH({e}) - MONTH({s}))"
    day0 = f"(DAY({e}) - DAY({s}))"
    m = f"({m_raw} - (CASE WHEN {day0} < 0 THEN 1 ELSE 0 END))"
    days = f"({day0} + (CASE WHEN {day0} < 0 THEN DAY(LAST_DAY({s})) ELSE 0 END))"
    years = f"(CAST(FLOOR({m} / 12.0) AS INTEGER))"
    mon = f"(CAST({m} - {years} * 12 AS INTEGER))"
    last = f"CAST(({s} + to_years({years}) + to_months({mon})) AS DATE)"
    nxt = f"CAST(({s} + to_years({years}) + to_months({mon} + 1)) AS DATE)"
    return (
        f"(CAST({m} AS DOUBLE)"
        f" + CAST({days} AS DOUBLE)"
        f" / CAST(DATEDIFF('day', {last}, {nxt}) AS DOUBLE))"
    )
