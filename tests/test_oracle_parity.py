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


#: The only Spark↔DuckDB output-type pairs any oracle is allowed to
#: produce.  The round-5 driver hash-failed two oracles whose final
#: projections carried bare integer SUM()s — DuckDB types those HUGEINT
#: (int128) while Spark returns BIGINT, and the driver's hasher is
#: dtype-aware even though Python-side value comparison canonicalizes
#: both to int.  This test catches that class statically: Spark's side
#: is plan-only (no action) and DuckDB's side is a DESCRIBE.
_ALLOWED_TYPE_PAIRS = {
    ("bigint", "BIGINT"),
    ("int", "INTEGER"),
    ("double", "DOUBLE"),
    ("string", "VARCHAR"),
    ("date", "DATE"),
    ("timestamp_ntz", "TIMESTAMP"),
    ("boolean", "BOOLEAN"),
}


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_output_types_match(spark, sf_dir, con, name):
    spark_types = dict(QUERIES[name](spark, sf_dir).dtypes)
    duck_desc = con.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
    bad = [
        (col, spark_types.get(col), dtyp)
        for col, dtyp, *_ in duck_desc
        if (spark_types.get(col), dtyp) not in _ALLOWED_TYPE_PAIRS
    ]
    assert not bad, (
        f"{name}: oracle/Spark dtype pairs outside the allowed set "
        f"(cast the oracle's aggregate — DuckDB HUGEINT breaks the "
        f"driver hash): {bad}"
    )


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
