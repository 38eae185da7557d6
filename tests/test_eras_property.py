"""Property-based equivalence for era derivation (SURVEY §7 calls this
the proof obligation): hypothesis generates adversarial event sets —
overlapping, adjacent, gapped, duplicate-date, unordered — and
``derive_eras`` must match an independent pure-Python implementation of
the OHDSI semantics (running max of padded ends, consistent ordering).

All generated cases are batched into ONE Spark job (case id is a
partition key), so hypothesis's many examples cost one round trip.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pedsnetdcc_spark.operators.eras import derive_eras

GAP = 3
BASE = dt.date(2020, 1, 1)


def python_eras(events: list[tuple[int, int]], gap: int) -> list[tuple[str, str, int]]:
    """Reference semantics: sort by (start, end); new era when start >
    max(prev ends) + gap; era = (min start, max end, distinct starts)."""
    evs = sorted((BASE + dt.timedelta(d), BASE + dt.timedelta(e)) for d, e in events)
    out = []
    cur: list[tuple[dt.date, dt.date]] = []
    max_end: dt.date | None = None
    for s, e in evs:
        if max_end is not None and s > max_end + dt.timedelta(gap):
            out.append(cur)
            cur = []
            max_end = None
        cur.append((s, e))
        max_end = e if max_end is None or e > max_end else max_end
    if cur:
        out.append(cur)
    return [
        (
            str(min(s for s, _ in isl)),
            str(max(e for _, e in isl)),
            len({s for s, _ in isl}),
        )
        for isl in out
    ]


event_lists = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 12)).map(
        lambda t: (t[0], t[0] + t[1])  # end >= start
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(event_lists, min_size=1, max_size=8))
def test_derive_eras_matches_python_reference(spark_session_holder, cases):
    spark = spark_session_holder
    rows = [
        (ci, BASE + dt.timedelta(s), BASE + dt.timedelta(e))
        for ci, evs in enumerate(cases)
        for s, e in evs
    ]
    df = spark.createDataFrame(rows, "case_id int, sd date, ed date")
    got = derive_eras(df, ["case_id"], "sd", "ed", gap_days=GAP)
    by_case: dict[int, list] = {}
    for r in got.collect():
        by_case.setdefault(r["case_id"], []).append(
            (str(r["era_start_date"]), str(r["era_end_date"]), r["era_count"])
        )
    for ci, evs in enumerate(cases):
        expected = sorted(python_eras(evs, GAP))
        actual = sorted(by_case.get(ci, []))
        assert actual == expected, (ci, evs, actual, expected)


import pytest


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    return spark
