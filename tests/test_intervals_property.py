"""Property-based checks for months_in_interval (SURVEY §7 flags its
fractional-month semantics as the hardest correctness piece): equality
with an independent Python reference implementing the same anchor-month
arithmetic, monotonicity in the event date, and exactness on whole-month
boundaries.  Examples batched into one Spark job."""

from __future__ import annotations

import calendar
import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pedsnetdcc_spark.functions.intervals import months_in_interval

import pytest


def add_months_clamped(d: dt.date, m: int) -> dt.date:
    y, mo = divmod((d.year * 12 + d.month - 1) + m, 12)
    mo += 1
    day = min(d.day, calendar.monthrange(y, mo)[1])
    return dt.date(y, mo, day)


def python_months_in_interval(start: dt.date, end: dt.date) -> float:
    """Independent model of the reference's Postgres formula: age()'s
    field-wise subtraction with the day borrow taking the LENGTH OF THE
    START'S OWN MONTH, and denominator anchors clamping sequentially
    (+years first, then +months)."""
    m = (end.year - start.year) * 12 + end.month - start.month
    days = end.day - start.day
    if days < 0:
        days += calendar.monthrange(start.year, start.month)[1]
        m -= 1
    years, mon = divmod(m, 12)
    base = add_months_clamped(start, years * 12)
    last = add_months_clamped(base, mon)
    nxt = add_months_clamped(base, mon + 1)
    return m + days / (nxt - last).days


dates = st.dates(min_value=dt.date(1995, 1, 1), max_value=dt.date(2030, 12, 31))


@pytest.fixture(scope="module")
def spark_holder(spark):
    return spark


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(dates, dates), min_size=1, max_size=40))
def test_months_in_interval_matches_python_reference(spark_holder, pairs):
    spark = spark_holder
    pairs = [(i, min(a, b), max(a, b)) for i, (a, b) in enumerate(pairs)]
    df = spark.createDataFrame(pairs, "i int, s date, e date")
    got = {
        r["i"]: r["m"]
        for r in df.select("i", months_in_interval("s", "e").alias("m")).collect()
    }
    for i, s, e in pairs:
        assert got[i] == pytest.approx(python_months_in_interval(s, e), abs=1e-12), (s, e)


def test_whole_month_boundaries_exact(spark):
    rows = [
        (1, dt.date(2020, 1, 15), dt.date(2020, 2, 15), 1.0),
        (2, dt.date(2020, 1, 31), dt.date(2020, 3, 31), 2.0),
        (3, dt.date(2020, 1, 1), dt.date(2021, 1, 1), 12.0),
        (4, dt.date(2020, 2, 29), dt.date(2020, 3, 29), 1.0),
    ]
    df = spark.createDataFrame([(i, s, e) for i, s, e, _ in rows], "i int, s date, e date")
    got = {r["i"]: r["m"] for r in df.select("i", months_in_interval("s", "e").alias("m")).collect()}
    for i, _, _, expect in rows:
        assert got[i] == expect


def test_registered_sql_function_matches_expression(spark, sf_dir):
    from pedsnetdcc_spark.functions.intervals import register_sql_functions
    from pedsnetdcc_spark.sources.io import read_table

    register_sql_functions(spark)
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("t_orders")
    sql_vals = {
        r["o_orderkey"]: r["m"]
        for r in spark.sql(
            "SELECT o_orderkey, months_in_interval(CAST(o_orderdate AS DATE), "
            "DATE'2002-03-07') AS m FROM t_orders"
        ).collect()
    }
    import pyspark.sql.functions as F2

    expr_vals = {
        r["o_orderkey"]: r["m"]
        for r in read_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            months_in_interval(
                F2.col("o_orderdate").cast("date"), F2.lit("2002-03-07").cast("date")
            ).alias("m"),
        )
        .collect()
    }
    assert sql_vals == expr_vals


def test_monotone_within_no_borrow_segment(spark):
    # Between two same-day-of-month anchors with no day borrow, the
    # value is strictly increasing in the event date.
    start = dt.date(2010, 6, 15)
    days = [(d, start, dt.date(2011, 3, d)) for d in range(15, 29)]
    df = spark.createDataFrame(days, "i int, s date, e date")
    vals = [
        r["m"]
        for r in df.select("i", months_in_interval("s", "e").alias("m"))
        .orderBy("i")
        .collect()
    ]
    assert all(b > a for a, b in zip(vals, vals[1:]))


def test_postgres_age_quirks_pinned(spark):
    """Pin the two Postgres conventions the engine must replicate:
    the borrow takes the START month's length (Jan 15 → Mar 10 is
    1 mon 26 days: -5 + 31, not -5 + 28), which makes the value
    locally NON-monotonic across month boundaries; and month-end
    clamped starts divide by the anchor-month span."""
    rows = [
        # (start, end, months, days, denom) hand-derived from the formula
        (1, dt.date(2001, 1, 15), dt.date(2001, 3, 10), 1 + 26 / 28),
        (2, dt.date(2001, 1, 15), dt.date(2001, 3, 14), 1 + 30 / 28),  # > 2.0!
        (3, dt.date(2001, 1, 15), dt.date(2001, 3, 15), 2.0),
        (4, dt.date(2001, 1, 31), dt.date(2001, 3, 30), 1 + 30 / 31),
        # leap start + 23-month age: sequential anchors give last=Jan 28,
        # nxt=Feb 28 (denom 31); a single 24-month add would clamp to
        # Feb 28 from Jan 29 (denom 30) — pins convention #2.
        (5, dt.date(2000, 2, 29), dt.date(2002, 2, 10), 23 + 10 / 31),
        (6, dt.date(2001, 1, 31), dt.date(2001, 3, 1), 1 + 1 / 31),
    ]
    df = spark.createDataFrame([(i, s, e) for i, s, e, _ in rows], "i int, s date, e date")
    got = {r["i"]: r["m"] for r in df.select("i", months_in_interval("s", "e").alias("m")).collect()}
    for i, s, e, expect in rows:
        assert got[i] == pytest.approx(expect, abs=1e-12), (s, e, got[i], expect)
        assert got[i] == pytest.approx(python_months_in_interval(s, e), abs=1e-12)
