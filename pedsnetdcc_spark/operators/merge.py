"""Multi-site merge — the ``merge_site_data`` analog.

The reference consolidates N per-site schemas into ``dcc_pedsnet`` with
one ``CREATE TABLE t AS SELECT … UNION ALL …`` per table (reference:
pedsnetdcc/merge_site_data.py:28-41,134-163,337-369).

Spark shape: ``unionByName`` over per-site reads.  Scale: a union of
parquet scans is a metadata-only plan operation — no shuffle; writing
the merged table ``partitionBy("site")`` preserves site pruning for
downstream per-site queries, which is what the reference's per-site
schemas provided.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_sites(
    site_frames: Sequence[tuple[str, DataFrame]],
    site_col: str | None = "site",
    select_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Union per-site tables, optionally tagging each row with its site
    (the reference's merged tables carry a ``site`` column added by the
    site-name transform, merge_site_data.py:134-163).
    """

    def prep(site: str, df: DataFrame) -> DataFrame:
        if select_cols:
            df = df.select(*select_cols)
        if site_col and site_col not in df.columns:
            df = df.withColumn(site_col, F.lit(site))
        return df

    return reduce(DataFrame.unionByName, (prep(s, df) for s, df in site_frames))


def merge_namespace(
    sites: Sequence[str],
    read: Callable[[str], DataFrame],
    site_col: str = "site",
) -> DataFrame:
    """Merge one table across sites given a per-site reader."""
    return merge_sites([(s, read(s)) for s in sites], site_col=site_col)
