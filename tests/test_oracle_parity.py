"""Every oracle-backed query must match its DuckDB oracle exactly —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from pedsnetdcc_spark.queries import ORACLES, QUERIES
from tests.oracle import compare, duck_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, con, name):
    df = QUERIES[name](spark, sf_dir)
    problems = compare(df, con, ORACLES[name])
    assert not problems, f"{name}: " + "; ".join(problems)


def test_every_query_has_callable():
    for name, fn in QUERIES.items():
        assert callable(fn), name
