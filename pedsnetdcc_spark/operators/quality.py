"""Value-quality filters — the z-score pipeline's data hygiene.

The reference deletes measurement rows whose ``value_as_number`` is the
literal ``'NaN'`` and rows whose rounded absolute value overflows
NUMERIC(20,5) (``round(abs(v)) > 10^15``) before running derivations
(reference: pedsnetdcc/z_score.py:19-20,428-485).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drop_invalid_values(
    df: DataFrame, value_col: str, abs_limit: float = 1e15
) -> DataFrame:
    """Drop NaN/null-unsafe and overflow values (z_score.py:19-20).
    Nulls are retained — the reference deletes only explicit NaNs and
    overflows."""
    v = F.col(value_col)
    return df.filter(v.isNull() | (~F.isnan(v) & (F.abs(v) <= F.lit(abs_limit))))
