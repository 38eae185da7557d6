"""Local stand-in for the driver's DuckDB-oracle comparison.

Registers the parquet tables as DuckDB views, runs a query's oracle SQL,
and compares against the Spark result: row count, column names, and an
order-insensitive exact value comparison (floats compared bit-exactly —
the engine is built so Spark and DuckDB agree exactly; decimals/dates
canonicalized).
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v: object) -> object:
    if isinstance(v, Decimal):
        return f"{v.normalize():f}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    oracle = con.execute(sql)
    o_cols = [d[0] for d in oracle.description]
    o_rows = oracle.fetchall()
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")

    # driver sorts columns by name before hashing values — do the same
    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    o_idx = [o_cols.index(c) for c in sorted(o_cols)]
    s_set = sorted(
        (tuple(_canon(r[i]) for i in s_idx) for r in s_rows), key=repr
    )
    o_set = sorted(
        (tuple(_canon(r[i]) for i in o_idx) for r in o_rows), key=repr
    )
    if s_set != o_set:
        extra = [r for r in s_set if r not in o_set][:3]
        missing = [r for r in o_set if r not in s_set][:3]
        problems.append(
            f"values differ (cols {sorted(s_cols)}); spark-only sample: {extra}; "
            f"oracle-only sample: {missing}"
        )
    return problems
