"""Domain split / partition routing — the measurement split analog.

The reference vertically splits ``measurement`` into anthro/labs/vitals
by concept-id IN-lists (reference: pedsnetdcc/split_measurement.py:
12-13,94-103), later converts that to declarative partitioning with a
routing trigger (partition_measurement.py:11-303), and re-exposes the
whole as a UNION ALL view (split_measurement.py:325-331).

Spark shape: a classifier CASE expression + ``partitionBy`` on write.
Scale: partition pruning then serves the same point-workload purpose the
reference's CHECK constraints did — a query filtered to one domain scans
one directory.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pedsnetdcc_spark.operators.transforms import classifier_case


def classify_domain(
    df: DataFrame,
    code_col: str,
    domains: dict[str, Sequence[object]],
    default: str = "other",
    out_col: str = "domain",
) -> DataFrame:
    """Append the routing-domain column (the trigger's CASE,
    partition_measurement.py:26-43)."""
    return df.withColumn(out_col, classifier_case(code_col, domains, default))


def split_by_domain(
    df: DataFrame,
    code_col: str,
    domains: dict[str, Sequence[object]],
    default: str = "other",
) -> dict[str, DataFrame]:
    """Materializable per-domain slices (split_measurement.py:94-103).
    Each slice filters by the IN-list so Catalyst pushes the predicate
    to the scan; no classifier column is added to the outputs."""
    out: dict[str, DataFrame] = {}
    claimed: list[object] = []
    for name, ids in domains.items():
        out[name] = df.filter(F.col(code_col).isin(list(ids)))
        claimed.extend(ids)
    out[default] = df.filter(~F.col(code_col).isin(claimed))
    return out


def write_partitioned(
    df: DataFrame,
    path: str,
    code_col: str,
    domains: dict[str, Sequence[object]],
    default: str = "other",
    out_col: str = "domain",
) -> None:
    """Write domain-partitioned (partition_measurement.py:289-303's
    declarative partitioning, as ``partitionBy``)."""
    classify_domain(df, code_col, domains, default, out_col).write.mode(
        "overwrite"
    ).partitionBy(out_col).parquet(path)
