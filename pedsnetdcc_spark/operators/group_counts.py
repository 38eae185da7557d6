"""Group-count summary tables — the index-replacement rollups.

The reference replaces fat per-column indexes on merged tables with
small ``(value, id, count)`` summary tables: ``CREATE TABLE t_col AS
SELECT col, id, count(id) FROM t GROUP BY col, id ORDER BY col``
(reference: pedsnetdcc/concept_group_tables.py:19,32-44 — four tables ×
two columns each).

Scale: a two-key groupBy with map-side partial aggregation; output is
cardinality-of-(col,id) rows — tiny — so the final sort is cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_count_table(df: DataFrame, value_col: str, id_col: str) -> DataFrame:
    return (
        df.groupBy(value_col, id_col)
        .agg(F.count(F.col(id_col)).alias("cnt"))
        .orderBy(value_col, id_col)
    )
