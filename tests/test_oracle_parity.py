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


def test_capped_universe_binds_identically(spark, sf_dir, con):
    """The equivalence-prover universe cap (hash-ordered top-N) never
    binds at the driver's correctness scale (corpus < N), so the regular
    parity run cannot catch a Spark/DuckDB disagreement in the capped
    ORDER/LIMIT seam itself.  Pin it with a cap small enough to bind:
    both engines must select the identical 100 documents."""
    from pedsnetdcc_spark.queries import _capped_universe, _capped_universe_sql, _t

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    capped = _capped_universe(docs, "doc_id", n=100)
    sql = f"SELECT doc_id FROM {_capped_universe_sql('documents', 'doc_id', n=100)}"
    problems = compare(capped, con, sql)
    assert not problems, "; ".join(problems)
