"""Conflict-skipping insert — ``INSERT … ON CONFLICT DO NOTHING``.

The reference copies era/BMI/z-score results into master tables with
conflict-skip inserts (reference: pedsnetdcc/era.py:421-457,
bmi.py:177-215, z_score.py:255-293).  The Spark equivalent is a
left-anti join of the incoming rows against existing keys, then an
append (SURVEY.md §2.1 S3).

Scale: existing keys are projected to the key columns only before the
anti join, so the probe side is narrow; with a table format (Delta/
Iceberg) this maps to ``MERGE WHEN NOT MATCHED THEN INSERT`` instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def insert_missing(
    target: DataFrame, incoming: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Return ``target`` plus the incoming rows whose key is not already
    present.  Pure-DataFrame form: caller writes the result (append mode
    writes only ``new_rows`` in a real sink)."""
    new_rows = incoming.join(target.select(*keys).distinct(), list(keys), "left_anti")
    return target.unionByName(new_rows)
