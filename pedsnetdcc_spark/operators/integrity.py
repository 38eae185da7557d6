"""Referential-integrity checks — the ``check_fact_relationship`` analog.

The reference probes the polymorphic ``fact_relationship`` table with a
LEFT JOIN per (domain, fact-id column) and counts rows whose referenced
fact is missing, plus LIMIT-1 exemplar rows (reference:
pedsnetdcc/check_fact_relationship.py:49-137 counts, 142-248 samples).

Spark shape: left-anti joins.  Scale: each probe is an anti join on an
id; the domain filter is applied before the join so only that domain's
slice shuffles, and all probes are independent Spark jobs that the
scheduler runs concurrently (the reference needed a 5-process pool for
this, check_fact_relationship.py:289-290).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class IntegrityProbe:
    """One FK column of ``fact`` checked against ``target``'s key."""

    name: str
    fk_col: str
    target: DataFrame
    target_key: str
    domain_filter: Column | None = None


def missing_references(fact: DataFrame, probe: IntegrityProbe) -> DataFrame:
    """Rows of ``fact`` (optionally restricted to a domain) whose
    ``fk_col`` has no match in the target — one reference probe
    (check_fact_relationship.py:49-60 pattern)."""
    f = fact.filter(probe.domain_filter) if probe.domain_filter is not None else fact
    tgt = probe.target.select(F.col(probe.target_key).alias("__tk")).distinct()
    return f.join(tgt, f[probe.fk_col] == tgt["__tk"], "left_anti")


def referential_integrity_counts(
    fact: DataFrame, probes: Sequence[IntegrityProbe]
) -> DataFrame:
    """One row per probe: ``(probe, total, bad)`` — total rows in the
    domain slice and rows with a dangling reference (the reference's
    per-domain total/bad counts, check_fact_relationship.py:15-137)."""
    parts = []
    for p in probes:
        f = fact.filter(p.domain_filter) if p.domain_filter is not None else fact
        tgt = p.target.select(F.col(p.target_key).alias("__tk")).distinct()
        joined = f.join(tgt, f[p.fk_col] == tgt["__tk"], "left")
        parts.append(
            joined.agg(
                F.lit(p.name).alias("probe"),
                F.count(F.lit(1)).alias("total"),
                F.count(F.when(F.col("__tk").isNull(), 1)).alias("bad"),
            )
        )
    return reduce(DataFrame.unionByName, parts)


def integrity_samples(
    fact: DataFrame, probes: Sequence[IntegrityProbe], n: int = 1
) -> dict[str, list]:
    """Up to ``n`` exemplar bad rows per probe (the LIMIT 1 sampling,
    check_fact_relationship.py:142-248)."""
    return {p.name: missing_references(fact, p).limit(n).collect() for p in probes}


def integrity_exemplars(
    fact: DataFrame, probes: Sequence[IntegrityProbe], n: int = 1
) -> DataFrame:
    """Deterministic exemplar sampling: the ``n`` SMALLEST dangling FK
    values per probe, as one DataFrame ``(probe, exemplar_fk)``.

    The reference samples with a bare ``LIMIT 1``
    (check_fact_relationship.py:142-248) — any bad row satisfies it, so
    its output is whatever Postgres happens to scan first.  Min-by-key
    over DISTINCT dangling values pins the canonical choice, making
    exemplars reproducible across runs, engines, and partitionings and
    showing ``n`` different violations instead of one repeated value.

    Scale: each probe is its anti join, a partial-aggregating distinct,
    then ``TakeOrdered(n)`` — per-partition top-n and a driver merge of
    n×partitions values, no global sort; probes are independent jobs the
    scheduler overlaps."""
    parts = []
    for p in probes:
        bad = (
            missing_references(fact, p)
            .select(F.col(p.fk_col).alias("exemplar_fk"))
            .distinct()
            .orderBy("exemplar_fk")
            .limit(n)
        )
        parts.append(bad.select(F.lit(p.name).alias("probe"), "exemplar_fk"))
    return reduce(DataFrame.unionByName, parts)
