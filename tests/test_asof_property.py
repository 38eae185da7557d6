"""Property-based check for asof_match_nearest: hypothesis-generated
left/right event sets per key vs a brute-force Python reference
(nearest by |Δt|, ties to the earlier right event, tolerance bound).
Batched into one Spark job."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pedsnetdcc_spark.operators.anthro import asof_match_nearest

BASE = dt.datetime(2024, 1, 1)
TOL_SEC = 3 * 3600  # 3 hours


def python_nearest(lts: int, rights: list[tuple[int, float]]) -> float | None:
    # operator rule: one right event per instant (lexicographic-min
    # payload), nearest by |Δt|, distance ties to the earlier event
    dedup: dict[int, float] = {}
    for rts, rv in rights:
        if rts not in dedup or rv < dedup[rts]:
            dedup[rts] = rv
    best = None
    for rts, rv in sorted(dedup.items()):
        d = abs(rts - lts)
        if d > TOL_SEC:
            continue
        if best is None or d < best[0] or (d == best[0] and rts < best[1]):
            best = (d, rts, rv)
    return None if best is None else best[2]


# offsets in minutes over a day; values tag identity
case = st.tuples(
    st.lists(st.integers(0, 1440), min_size=1, max_size=6),   # left event minutes
    st.lists(st.integers(0, 1440), min_size=0, max_size=6),   # right event minutes
)


@pytest.fixture(scope="module")
def spark_holder(spark):
    return spark


@settings(max_examples=50, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(case, min_size=1, max_size=6))
def test_asof_matches_python_reference(spark_holder, cases):
    spark = spark_holder
    left_rows, right_rows = [], []
    expected = {}
    for k, (lefts, rights) in enumerate(cases):
        rights_sec = [(m * 60, float(1000 * k + i)) for i, m in enumerate(sorted(rights))]
        for j, lm in enumerate(lefts):
            lid = k * 100 + j
            left_rows.append((lid, k, BASE + dt.timedelta(seconds=lm * 60)))
            expected[lid] = python_nearest(lm * 60, rights_sec)
        for rts, rv in rights_sec:
            right_rows.append((k, BASE + dt.timedelta(seconds=rts), rv))
    left = spark.createDataFrame(left_rows, "lid long, k long, ts timestamp")
    if right_rows:
        right = spark.createDataFrame(right_rows, "k long, ts timestamp, v double")
    else:
        right = spark.createDataFrame([], "k long, ts timestamp, v double")
    out = asof_match_nearest(
        left, right, ["k"], "ts", "ts", tolerance_sec=TOL_SEC, right_cols={"v": "mv"}
    )
    got = {r["lid"]: r["mv"] for r in out.collect()}
    assert got == expected
