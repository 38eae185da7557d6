"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition when the input arrives with fewer source files than
    the cluster has slots — a small parquet file scans as ONE split,
    which serializes every CPU-bound per-row stage after it.  At real
    scale the scan already has ≥ slots files and this is a no-op.

    The file count UNDERCOUNTS effective starvation too: a single
    parquet file written as one row group scans as ONE non-empty split
    no matter how Spark byte-range-partitions it (measured: the
    quality-classifier pipeline on a 500k-doc single-file corpus ran
    70.1 s serialized vs 7.75 s with this guard — 9×; see SCALE.md
    round-9).  Guarding at each scan-fused per-row operator keeps the
    fix local: at real scale (files ≥ slots) nothing changes and the
    shuffle-free plans stay shuffle-free.

    The probe is ``df.inputFiles()`` — FileIndex metadata read
    plan-side (no job, no RDD lineage analysis; the previous
    ``df.rdd.getNumPartitions()`` probe built the physical RDD chain
    per call).  File count over-estimates split count when many tiny
    files pack into one split, but the guarded case — one or two files
    feeding a CPU-bound Pandas stage — is decided identically, and a
    non-file DataFrame (no files reported) is left untouched.

    Idempotent across composed operators: if the lineage already holds
    a SHUFFLING repartition with an EXPLICIT width ≥ slots (this guard
    upstream — ``Repartition n, true`` — or an explicit-count key
    repartition, ``RepartitionByExpression [...], n``), a second
    exchange would shuffle the stream again for nothing.  The check is
    on the analyzed logical plan (job-free) and deliberately does NOT
    trust:

    - ``coalesce()`` — logically also a Repartition node but with
      shuffle=false and a LOW target;
    - a narrow ``repartition(k)`` / ``repartition(k, col)`` with
      k < slots — still starved;
    - ``repartition(col)`` with NO explicit count — AQE is free to
      coalesce that exchange by INPUT bytes, and for a small stream
      feeding a compute-amplifying stage (a capped proof universe
      fanning into an O(n²) verify) it coalesces to ONE partition,
      re-serializing exactly the work the guard exists to spread
      (measured: embedding_near_dup 1.3 s → 9.6 s when a lineage
      check trusted the bare RepartitionByExpression; AQE leaves
      explicit-count repartitions alone, which is also why the
      guard's own output suppresses downstream guards)."""
    import re

    spark = df.sparkSession
    par = min_partitions or spark.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        return df
    if not (0 < n_files < par):
        return df
    try:
        plan = df._jdf.queryExecution().logical().toString()
        # Only the OUTERMOST repartition-family node (first in the
        # top-down plan string) describes the stream's final layout: a
        # wide repartition buried under a later coalesce() — or on the
        # other branch of a join — must not vouch for a starved stream.
        m = re.search(
            r"\bRepartition (\d+), (true|false)"
            r"|RepartitionByExpression \[[^\]]*\](?:, (\d+))?",
            plan,
        )
        if m:
            if m.group(1) is not None:  # Repartition n, true/false
                if m.group(2) == "true" and int(m.group(1)) >= par:
                    return df
            elif m.group(3) is not None:  # RepartitionByExpression [...], n
                if int(m.group(3)) >= par:
                    return df
            # narrow, coalesce, or width-elided (AQE-coalescible):
            # fall through and fire
    except Exception:
        pass
    return df.repartition(par)


def repartition_by_key(df: DataFrame, *cols, num_partitions: int | None = None) -> DataFrame:
    """Key-clustered repartition that OPTS OUT of AQE partition
    coalescing by carrying an explicit width.

    A bare ``df.repartition(col)`` leaves the width to AQE, which
    sizes the exchange by INPUT bytes — correct for byte-bound
    consumers, wrong for compute-amplifying ones: a doc-keyed text
    stream explodes ~100× into tokens/shingles before aggregating, so
    byte-sizing a ~30 MB stream to 1-3 partitions serializes the CPU
    work behind it (measured: simhash64 at sf0.1 1.2 s bare → 0.5 s
    explicit, 2.6×; the capped proof universes hit the same cliff at
    ~1 MB → ONE partition, embedding_near_dup 1.3 → 9.6 s).  The
    explicit width is max(shuffle partitions, default parallelism) —
    at least what the exchange would get with AQE off, never below the
    slot count (so `ensure_parallelism` downstream trusts it and does
    not stack a round-robin exchange on top when a session runs with
    shuffle_partitions < cores), and on a real cluster the submitter
    already sizes both to the fleet.  A non-numeric
    ``spark.sql.shuffle.partitions`` (e.g. an auto-tuning platform
    value) degrades to default parallelism alone."""
    sc = df.sparkSession.sparkContext
    if num_partitions:
        n = num_partitions
    else:
        try:
            shuffle_n = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions")
            )
        except (TypeError, ValueError):
            shuffle_n = 0
        n = max(shuffle_n, sc.defaultParallelism)
    return df.repartition(n, *cols)


def salted_join(
    left: "DataFrame",
    right: "DataFrame",
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> "DataFrame":
    """Skew-mitigating equi-join: salt the (skewed) left side's key with
    a deterministic bucket derived from the whole row hash, replicate
    the right side ``salt``× — the classic manual remedy when one hot
    key overwhelms a single shuffle partition.  AQE's skew-join split
    (enabled in build_session) handles most cases automatically; this
    operator covers engines/joins AQE can't split (e.g. bucketed-table
    joins, or pre-AQE deployments).

    Semantics-preserving for inner/left joins on an equi-key.
    """
    from pyspark.sql import functions as F

    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l = left.withColumn("__salt", lsalt)
    r = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    out = l.join(r, [key, "__salt"], how)
    return out.drop("__salt")
