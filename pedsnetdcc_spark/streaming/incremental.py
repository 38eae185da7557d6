"""Incremental/streaming variants of the derivation operators.

The reference is strictly batch — its "sync" jobs recompute derived
tables wholesale per data cycle (reference:
pedsnetdcc/sync_observation_period.py; SURVEY.md §2.10 records that no
streaming surface exists to port).  These operators are the documented
*extensions*: the same derivations expressed over Structured Streaming
so a continuously-loaded lake maintains them incrementally instead of
re-deriving per cycle.

Each builder takes a streaming DataFrame (``spark.readStream...``) and
returns the transformed streaming DataFrame; callers attach the sink
(``writeStream`` + trigger).  All of them also accept a *batch*
DataFrame and produce identical results — the logic is mode-agnostic,
which is how the tests pin streaming output to the batch oracle.

Scale notes: state is keyed per entity (person/user), so it shards
across executors with the shuffle; watermarks bound state growth for
the windowed/session aggregations.
"""

from __future__ import annotations

import os
from collections.abc import Sequence
from contextlib import contextmanager

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default shuffle/state partition count for the *streaming* queries —
#: deliberately NOT the batch session default (= core count).  A
#: stateful streaming query's shuffle-partition count is its
#: state-store count: it is pinned into the checkpoint at batch 0 for
#: the life of the stream, AQE never coalesces it (AQE is disabled
#: under the micro-batch planner), and EVERY micro-batch pays one task
#: launch + one state-store open/commit (delta file write + fsync) per
#: partition regardless of how little data arrived.  So the right
#: size tracks the stream's KEY CARDINALITY / state volume, not the
#: submitting machine's cores.  The bench streams are key-bounded by
#: contract (≤500 era keys, ≤~200 windows, ≤band×bucket groups of a
#: 2000-doc capped universe), where 8 partitions spread state amply;
#: a production deployment with millions of state keys raises
#: SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS at submit time (the value
#: must then stay fixed across restarts of the same checkpoint —
#: Spark enforces this).  A fixed small default also keeps the bench
#: comparable across the driver's core counts: the per-batch overhead
#: no longer scales with local core count.
DEFAULT_STREAM_SHUFFLE_PARTITIONS = int(
    os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", "8")
)


@contextmanager
def scoped_stream_shuffle_partitions(spark, n: int | None = None):
    """Set ``spark.sql.shuffle.partitions`` for the duration of a
    streaming query's start→drain window, restoring the batch session
    value after.  The value is captured by the stream's checkpoint at
    batch 0, so restoring after ``awaitTermination`` cannot affect the
    already-planned batches; batch queries planned outside the scope
    are untouched."""
    n = n or DEFAULT_STREAM_SHUFFLE_PARTITIONS
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Normalize the event-time column to TIMESTAMP: watermarks reject
    TIMESTAMP_NTZ, and parquet writers mark the same instant either way
    (isAdjustedToUTC).  The cast resolves NTZ in the session timezone —
    pinned to UTC in session.build_session — so both encodings yield the
    identical event time."""
    from pyspark.sql.types import TimestampNTZType

    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def streaming_interval_summary(
    df: DataFrame,
    key: str,
    start_expr: Column | str,
    end_expr: Column | str,
    key_name: str = "person_id",
    start_name: str = "period_start",
    end_name: str = "period_end",
) -> DataFrame:
    """Incremental observation-period maintenance: running per-entity
    min/max event time (the batch operator recomputes this wholesale —
    operators/interval_summary.py; here the aggregation state carries
    it forward).  Use output mode ``update``/``complete``."""
    s = F.col(start_expr) if isinstance(start_expr, str) else start_expr
    e = F.col(end_expr) if isinstance(end_expr, str) else end_expr
    return df.groupBy(F.col(key).alias(key_name)).agg(
        F.min(s).alias(start_name),
        F.coalesce(F.max(e), F.max(s)).alias(end_name),
    )


def streaming_event_counts(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    window_duration: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """Windowed event counts with a late-data watermark — the canonical
    watermark + windowed-agg shape; append-mode-capable, state pruned
    beyond the watermark horizon."""
    wm = _event_time(df, ts_col).withWatermark(ts_col, watermark)
    return (
        wm.groupBy(F.window(F.col(ts_col), window_duration).alias("win"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n_events",
        )
    )


def streaming_interval_eras(
    df: DataFrame,
    keys: Sequence[str],
    start_col: str,
    end_col: str,
    gap_days: int = 30,
    watermark: str = "35 days",
) -> DataFrame:
    """INTERVAL-valued era derivation over a stream — the custom
    stateful operator ``session_window`` cannot express (an event
    contributes ``[start, end]``, not a point, so a session must stay
    open while a long interval's end + gap is still reachable — e.g.
    drug exposures with days-supply; batch equivalent
    operators/eras.py:42 ``derive_eras``).

    Built on ``applyInPandasWithState`` (event-time timeout):

    - **state** per key = the events not yet inside a watermark-final
      era, as two epoch-nano arrays — bounded by the watermark + gap
      horizon, NOT by stream length: once the watermark passes an era's
      ``end + gap`` no in-watermark event can extend it, the era is
      emitted and its events dropped from state.
    - **each invocation** merges the new Arrow batches into state and
      re-derives eras over the retained horizon with the exact batch
      semantics (sort → gap-split → min start / max end / distinct-start
      count), so emitted rows are bit-identical to ``derive_eras`` on
      the same finalized prefix.
    - **timeouts** flush eras whose gap horizon expires without new
      events for the key (set to the earliest retained ``end + gap``).

    Output (append mode): ``keys + era_start_ts, era_end_ts,
    era_count``.  Eras still inside the horizon stay in state — on an
    unbounded stream they are not yet final by definition.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    keys = list(keys)
    out_schema = StructType(
        [df.schema[k] for k in keys]
        + [
            StructField("era_start_ts", TimestampType()),
            StructField("era_end_ts", TimestampType()),
            StructField("era_count", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("ev_starts", ArrayType(LongType())),
            StructField("ev_ends", ArrayType(LongType())),
        ]
    )
    gap_ns = gap_days * 86_400 * 10**9
    gap_ms = gap_days * 86_400 * 1_000

    def _ns(series: pd.Series) -> list[int]:
        return series.values.astype("datetime64[ns]").astype("int64").tolist()

    def fn(key, pdf_iter, state: GroupState):
        starts: list[int] = []
        ends: list[int] = []
        if state.exists:
            s0, e0 = state.get
            starts, ends = list(s0), list(e0)
        for pdf in pdf_iter:
            if len(pdf):
                starts.extend(_ns(pdf[start_col]))
                ends.extend(_ns(pdf[end_col]))
        wm_ns = state.getCurrentWatermarkMs() * 1_000_000
        ev = sorted(zip(starts, ends))
        eras: list[list] = []  # [start_ns, end_ns, distinct starts]
        for s, e in ev:
            e = max(e, s)
            if eras and s <= eras[-1][1] + gap_ns:
                eras[-1][1] = max(eras[-1][1], e)
                eras[-1][2].add(s)
            else:
                eras.append([s, e, {s}])
        # era ends strictly increase across a key's eras, so the
        # finalized set is a prefix and the retained events a suffix
        final = [er for er in eras if er[1] + gap_ns < wm_ns]
        keep = eras[len(final):]
        if keep:
            cut = keep[0][0]
            pairs = [(s, e) for s, e in ev if s >= cut]
            state.update(
                ([s for s, _ in pairs], [e for _, e in pairs])
            )
            state.setTimeoutTimestamp(
                max(keep[0][1] // 10**6 + gap_ms + 1, state.getCurrentWatermarkMs() + 1)
            )
        else:
            state.remove()
        if final:
            yield pd.DataFrame(
                [
                    tuple(key) + (pd.Timestamp(er[0]), pd.Timestamp(er[1]), len(er[2]))
                    for er in final
                ],
                columns=keys + ["era_start_ts", "era_end_ts", "era_count"],
            )

    df = _event_time(df, start_col)
    src = df.withWatermark(start_col, watermark) if watermark else df
    return src.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )


def streaming_eras(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap: str = "30 days",
    watermark: str | None = "35 days",
) -> DataFrame:
    """Streaming sessionization — the era derivation for point events as
    a built-in ``session_window`` aggregation: a session (era) closes
    when the next event is more than ``gap`` past the last one.

    For instantaneous events this matches the batch era operator with a
    zero-duration end date; interval-valued events (end dates, days
    supply) still need the batch window formulation
    (operators/eras.py), which streaming can host via
    ``applyInPandasWithState`` if ever needed.
    """
    df = _event_time(df, ts_col)
    src = df.withWatermark(ts_col, watermark) if watermark else df
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), *keys)
        .agg(F.count(F.lit(1)).alias("era_event_count"))
        .select(
            *keys,
            F.col("sw.start").alias("era_start"),
            F.col("sw.end").alias("era_end"),
            "era_event_count",
        )
    )


def streaming_exact_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming exact deduplication: emit only the FIRST document seen
    for each content hash (md5 of the text) — the continuous form of
    ``datapipe.dedup.exact_dedup_groups`` for an append-only ingest.

    With ``ts_col`` + ``watermark`` the dedup state is watermark-bounded
    (``dropDuplicatesWithinWatermark``): a repeat arriving inside the
    horizon is dropped, state older than the horizon is pruned — the
    practical contract for an ingest stream whose duplicates cluster in
    time (retries, re-crawls).  Without a watermark the state holds one
    entry per distinct content hash forever — exact global dedup, state
    grows with distinct content (one 16-byte digest per unique doc).

    State shards by the content hash with the shuffle; no skew (md5 is
    uniform).  Batch DataFrames work too (plain dropDuplicates
    semantics), which is how the test pins stream output to the batch
    operator.
    """
    keyed = df.withColumn("__content_hash", F.md5(F.col(text_col)))
    if ts_col is not None and watermark is not None:
        keyed = _event_time(keyed, ts_col).withWatermark(ts_col, watermark)
        if keyed.isStreaming:
            out = keyed.dropDuplicatesWithinWatermark(["__content_hash"])
        else:
            out = keyed.dropDuplicates(["__content_hash"])
    else:
        out = keyed.dropDuplicates(["__content_hash"])
    return out.drop("__content_hash")


def streaming_lsh_near_dup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 16,
    num_bands: int = 4,
    max_bucket: int | None = None,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Streaming MinHash-LSH near-duplicate detection: as documents
    arrive, each is signed, banded, and checked against the GROWING
    per-bucket index; every bucket collision emits ``(id_a, id_b,
    est_jaccard)`` the moment the second document lands — the
    continuous form of ``datapipe.dedup.lsh_candidate_pairs`` for an
    append-only ingest (crawl dedup before anything is written).

    Construction: the signature is the scan-fused per-row formulation
    (``fused_minhash_signatures`` — a stateless projection, so the
    stream needs no pre-aggregation), bands come from the SAME
    ``band_entries`` the batch join uses (buckets agree exactly), and
    the index is ``applyInPandasWithState`` keyed on ``(band,
    bucket)``: state = the ids + signatures seen in that bucket.  A
    pair colliding in several bands is emitted once per band —
    downstream dedup is one ``dropDuplicates([id_a, id_b])`` (batch)
    or ``dropDuplicatesWithinWatermark`` (stream); emission order
    within a batch pairs new arrivals against the index first, then
    each other.

    ``est_jaccard`` is the signature agreement (matching components /
    ``num_hashes``) — the standard unbiased MinHash estimate, available
    without re-reading either document.

    State is the index: it grows with distinct signed content, exactly
    like the exact-dedup state (one id + ``num_hashes`` longs per doc
    per band).  ``max_bucket`` caps a bucket's stored membership —
    arrivals beyond the cap still compare against the stored members
    but are not added (the NeMo-style hot-bucket guard: a degenerate
    bucket of boilerplate stops costing quadratic emission).
    Streaming-only (applyInPandasWithState rejects batch inputs); the
    test pins the two-micro-batch stream's emitted pair set to the
    batch ``lsh_candidate_pairs`` join over the same corpus.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from pedsnetdcc_spark.datapipe.dedup import (
        band_entries,
        fused_minhash_signatures,
    )

    id_type = df.schema[id_col].dataType
    sigs = fused_minhash_signatures(
        df, id_col, text_col, n=n, num_hashes=num_hashes, hash_family=hash_family
    )
    banded = sigs.select(
        F.col(id_col),
        F.col("sig"),
        F.explode(
            band_entries("sig", num_hashes, num_bands, hash_family)
        ).alias("__bb"),
    ).select(
        id_col,
        "sig",
        F.col("__bb.band").alias("band"),
        F.col("__bb.bucket").alias("bucket"),
    )
    out_schema = StructType(
        [
            StructField("id_a", id_type),
            StructField("id_b", id_type),
            StructField("est_jaccard", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("ids", ArrayType(id_type)),
            StructField("sigs", ArrayType(LongType())),  # flat, k per id
        ]
    )
    k = num_hashes

    def fn(key, pdf_iter, state: GroupState):
        ids: list = []
        flat: list[int] = []
        if state.exists:
            i0, s0 = state.get
            ids, flat = list(i0), list(s0)
        n_stored0 = len(ids)
        rows = []
        for pdf in pdf_iter:
            for rid, sig in zip(pdf[id_col], pdf["sig"]):
                rows.append((rid, [int(x) for x in sig]))
        out = []
        for rid, sig in rows:
            for j, other in enumerate(ids):
                osig = flat[j * k : (j + 1) * k]
                m = sum(1 for x, y in zip(sig, osig) if x == y)
                a, b = (rid, other) if rid < other else (other, rid)
                out.append((a, b, m / k))
            if max_bucket is None or len(ids) < max_bucket:
                ids.append(rid)
                flat.extend(sig)
        if len(ids) != n_stored0:
            state.update((ids, flat))
        if out:
            yield pd.DataFrame(out, columns=["id_a", "id_b", "est_jaccard"])

    return banded.groupBy("band", "bucket").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_time_bounded_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    l_ts: str,
    r_ts: str,
    max_lag_sec: int,
    watermark_sec: int = 3600,
) -> DataFrame:
    """Stream-stream time-bounded equi-join: pairs of left/right events
    with the same ``keys`` where the right event happened within
    ``max_lag_sec`` AT OR BEFORE the left event (``l_ts - max_lag <=
    r_ts <= l_ts``) — the candidate set of a backward as-of join,
    continuously maintained.  This is Spark's native watermarked
    stream-stream inner join: the time-interval condition plus both
    watermarks let the engine expire buffered state (right events older
    than ``watermark + max_lag`` can never match a future left event
    and are dropped), so state is bounded by rate × horizon per key
    shard.

    The two timestamp columns must be distinct names (rename before
    calling when both streams use e.g. ``ts``).  Works identically on
    batch DataFrames — the tests pin streamed output to the batch twin.
    """
    keys = list(keys)
    l = _event_time(left, l_ts).withWatermark(l_ts, f"{watermark_sec} seconds")
    r = _event_time(right, r_ts).withWatermark(r_ts, f"{watermark_sec} seconds")
    cond = None
    for k in keys:
        c = l[k] == r[k]
        cond = c if cond is None else (cond & c)
    time_cond = (F.col(r_ts) <= F.col(l_ts)) & (
        F.col(r_ts) >= F.col(l_ts) - F.expr(f"INTERVAL {int(max_lag_sec)} SECONDS")
    )
    cond = time_cond if cond is None else (cond & time_cond)
    joined = l.join(r, cond, "inner")
    # drop the duplicated key columns from the right side
    return joined.drop(*[r[k] for k in keys])
