"""View-DDL generation — the Oracle-views analog.

The reference emits a SQL file of ``CREATE OR REPLACE VIEW`` statements,
one per table, each aliasing every column with its case-folded name so
an Oracle consumer sees stable lowercase columns (reference:
pedsnetdcc/views.py:9-62).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def view_ddl(table: str, columns: Sequence[str], view_prefix: str = "v_") -> str:
    cols = ", ".join(f"{c} AS {c.lower()}" for c in columns)
    return f"CREATE OR REPLACE VIEW {view_prefix}{table} AS SELECT {cols} FROM {table}"


def generate_view_ddl(tables: dict[str, DataFrame], view_prefix: str = "v_") -> str:
    """One statement per table, semicolon-terminated — the emitted SQL
    file (views.py:9-62)."""
    return "\n".join(
        view_ddl(t, df.columns, view_prefix) + ";" for t, df in sorted(tables.items())
    )


def register_views(tables: dict[str, DataFrame], view_prefix: str = "v_") -> None:
    """Spark-native equivalent: temp views with lowercase columns."""
    for t, df in tables.items():
        df.toDF(*[c.lower() for c in df.columns]).createOrReplaceTempView(
            f"{view_prefix}{t}"
        )
