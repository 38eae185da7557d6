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
    m = (end.year - start.year) * 12 + end.month - start.month
    if end.day < start.day:
        m -= 1
    anchor = add_months_clamped(start, m)
    nxt = add_months_clamped(start, m + 1)
    return m + (end - anchor).days / (nxt - anchor).days


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


def test_monotone_in_event_date(spark):
    start = dt.date(2010, 6, 15)
    days = [(i, start, start + dt.timedelta(i)) for i in range(0, 1200, 7)]
    df = spark.createDataFrame(days, "i int, s date, e date")
    vals = [
        r["m"]
        for r in df.select("i", months_in_interval("s", "e").alias("m"))
        .orderBy("i")
        .collect()
    ]
    assert all(b > a for a, b in zip(vals, vals[1:]))
