"""WebDataset-style sharded tar sink/source for multimodal training
corpora.

Public convention (the webdataset project's format): a corpus is a
directory of POSIX tar shards (``shard-000000.tar`` …); a SAMPLE is the
run of consecutive tar members sharing one basename key with different
extensions (``000042.txt``, ``000042.png``, ``000042.json``).  Training
dataloaders stream shards sequentially — the shard is the unit of
parallelism and sequential IO is the point (no per-sample seeks, object
-store friendly).  The reference has no multimodal surface at all; this
is part of the engine's training-data extension family, next to the
JSONL corpus source (sources/jsonl.py) and the multimodal codecs
(datapipe/multimodal.py).

Spark mapping:

- WRITE — shard membership is a PURE FUNCTION of the sample key:
  ``repartition(shards, hash(key))`` hash-partitions rows by key value
  (explicit width, so AQE never coalesces it — SCALE.md round-9), and
  a within-partition sort on the key fixes member order, so the same
  corpus produces byte-identical shards regardless of how the input
  arrived partitioned.  Each task then streams its partition into ONE
  tar via the stdlib ``tarfile`` (no whole-shard buffering: members are
  appended as rows arrive).  Tar metadata is pinned (mtime=0,
  uid/gid=0) for reproducibility.
- READ — the shard list comes from Spark's ``binaryFile`` source with
  the ``content`` column PRUNED (only ``path``/``length`` are read, so
  listing scales without shipping blobs), one task per shard; each task
  streams its tar and yields samples in bounded Arrow batches.  Shards
  should be sized 128 MB–1 GB (the export_table rule of thumb) so a
  shard fits a task comfortably at any corpus size.

Paths must be visible to executors as POSIX paths (local, NFS, fuse
mounts — the usual WebDataset deployment).  For a pure object store,
read via ``spark.read.format("binaryFile")`` with ``content`` selected
and pass the blobs to :func:`iter_tar_samples` — same decode path.

Task-commit invariant: every shard is written under an ATTEMPT-UNIQUE
temp name (``.<shard>.attempt-<id>.tmp``) and published with one atomic
``os.replace`` when the task finishes.  Two attempts of the same
partition — speculative execution, a zombie task racing its re-attempt —
therefore never interleave writes into one file: each streams its own
temp, and the final path only ever holds a COMPLETE tar from exactly
one attempt (last committer wins; attempts are byte-identical by
construction, so which one wins is immaterial).  The target directory
must not already contain shards (stale ``shard-*.tar`` absent from a
rewritten manifest would resurrect silently on read) — pass
``mode="overwrite"`` to clean them first.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: samples per emitted Arrow batch on read — bounds executor/python
#: transfer memory when members are MB-scale binaries (same reasoning
#: as the session's 1024-row Arrow batch cap for multimodal columns)
_READ_BATCH_SAMPLES = 256


def _shard_name(pid: int) -> str:
    return f"shard-{pid:06d}.tar"


def _tarinfo(name: str, size: int) -> tarfile.TarInfo:
    ti = tarfile.TarInfo(name=name)
    ti.size = size
    ti.mtime = 0  # pinned: byte-identical shards for identical corpora
    ti.uid = ti.gid = 0
    ti.uname = ti.gname = ""
    ti.mode = 0o644
    return ti


def _write_shard(
    path: str,
    fname: str,
    attempt: int,
    recs: "Iterator[dict]",
    key_col: str,
    exts: dict[str, str],
    str_cols: set[str],
    meta_cols: list[str],
) -> tuple[int, int, int]:
    """Stream one partition's records into one shard tar and atomically
    publish it (the module-docstring task-commit invariant: attempt-
    unique temp name, ``os.replace`` on success).  Returns
    ``(samples, members, bytes)``.  Module-level so the two-writers
    race is unit-testable without a Spark task."""
    import pandas as pd

    tmp = os.path.join(path, f".{fname}.attempt-{attempt}.tmp")
    n_samples = n_members = 0
    with tarfile.open(tmp, "w") as tar:
        for rec in recs:
            key = rec[key_col]
            if key is None:
                raise ValueError("null sample key")
            key = str(key)
            if "." in key or "/" in key or "\\" in key:
                # the reader splits member names at the FIRST dot
                # (WebDataset convention): a key like 'v1.2' would
                # write 'v1.2.txt' and read back as key 'v1' with a
                # '2.txt' extension nobody asked for — silently
                # dropped content under a wrong key
                raise ValueError(
                    f"sample key {key!r} contains '.' or a path "
                    "separator; WebDataset keys are basename-up-to-"
                    "first-dot — sanitize keys upstream"
                )
            n_samples += 1
            for ext, col in exts.items():
                v = rec[col]
                if v is None:
                    continue
                data = v.encode("utf-8") if col in str_cols else bytes(v)
                tar.addfile(
                    _tarinfo(f"{key}.{ext}", len(data)), io.BytesIO(data)
                )
                n_members += 1
            if meta_cols:
                meta = {
                    c: (None if pd.isna(rec[c]) else rec[c])
                    for c in meta_cols
                }
                data = json.dumps(meta, sort_keys=True, default=str).encode(
                    "utf-8"
                )
                tar.addfile(
                    _tarinfo(f"{key}.json", len(data)), io.BytesIO(data)
                )
                n_members += 1
    size = os.path.getsize(tmp)
    os.replace(tmp, os.path.join(path, fname))  # atomic task commit
    return n_samples, n_members, size


def _stale_outputs(path: str) -> list[str]:
    """Prior-export artifacts in ``path`` that a re-export would have
    to reconcile: shard tars, manifests, quarantine lists, and orphaned
    attempt temp files."""
    if not os.path.isdir(path):
        return []
    return [
        p
        for p in os.listdir(path)
        if p.endswith(".tar")
        or p in ("manifest.jsonl", "_quarantine.jsonl")
        or (p.startswith(".") and p.endswith(".tmp"))
    ]


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str,
    members: dict[str, str],
    shards: int,
    meta_cols: list[str] | None = None,
    mode: str = "error",
) -> list[dict]:
    """Write ``df`` as ``shards`` WebDataset tar shards under ``path``.

    ``members`` maps extension → column: binary columns are written
    raw, string columns utf-8 (``{"png": "image", "txt": "text"}`` →
    members ``<key>.png``, ``<key>.txt``).  ``meta_cols`` are packed
    into one sorted-key ``<key>.json`` member (the WebDataset metadata
    convention).  Null member values are skipped (absent member); null
    keys and keys containing ``.`` / path separators are rejected (the
    reader splits member names at the FIRST dot, so such keys would
    silently corrupt).  Keys must be UNIQUE (the standard WebDataset
    sample rule — duplicate keys would merge into one sample on read);
    dedup upstream, e.g. ``exact_dedup_groups`` keepers.

    ``mode="error"`` (default) refuses a target directory that already
    holds shards or manifests — a re-export with fewer shards would
    leave stale ``shard-*.tar`` files absent from the new manifest,
    and the reader would return their samples with no mismatch
    detection.  ``mode="overwrite"`` removes the prior export's
    artifacts first (the streaming path gets the same safety per epoch
    via its temp-directory rename).

    Returns the per-shard manifest (shard file, samples, members,
    bytes) — the action that executes the write; manifest size is
    bounded by ``shards``.  Scale shape: ONE explicit-width exchange
    (hash of the key), then each task streams rows into its tar —
    memory is O(row), not O(shard).
    """
    if not members:
        raise ValueError("members must map at least one extension")
    meta_cols = list(meta_cols or [])
    cols = [key_col, *members.values(), *meta_cols]
    slim = df.select(*cols)
    types = dict(slim.dtypes)
    bad = {
        c: types[c]
        for c in members.values()
        if types[c] not in ("string", "binary")
    }
    if bad:
        # bytes(int) would write that many ZERO bytes — silent
        # corruption; route non-content columns through meta_cols
        raise ValueError(
            f"member columns must be string or binary, got {bad}; "
            "put scalar metadata in meta_cols instead"
        )
    str_cols = {c for c in members.values() if types[c] == "string"}
    if mode not in ("error", "overwrite"):
        raise ValueError(f"unknown mode {mode!r}")
    stale = _stale_outputs(path)
    if stale:
        if mode == "error":
            raise IOError(
                f"target {path} already holds a WebDataset export "
                f"({len(stale)} files, e.g. {sorted(stale)[:3]}); a "
                "partial rewrite would leave stale shards the manifest "
                "cannot detect — pass mode='overwrite' to replace it"
            )
        for p in stale:
            os.remove(os.path.join(path, p))
    os.makedirs(path, exist_ok=True)
    exts = dict(members)  # closure copy
    meta_cols_f = list(meta_cols)  # closure copy (already a list)

    out_schema = StructType(
        [
            StructField("shard", StringType()),
            StructField("samples", LongType()),
            StructField("members", LongType()),
            StructField("bytes", LongType()),
        ]
    )

    def write_partition(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        from pyspark import TaskContext

        ctx = TaskContext.get()
        fname = _shard_name(ctx.partitionId())

        def recs() -> Iterator[dict]:
            for pdf in batches:
                for row in pdf.itertuples(index=False):
                    yield row._asdict()

        n_samples, n_members, size = _write_shard(
            path, fname, ctx.taskAttemptId(), recs(), key_col, exts,
            str_cols, meta_cols_f,
        )
        yield pd.DataFrame(
            {
                "shard": [fname],
                "samples": [n_samples],
                "members": [n_members],
                "bytes": [size],
            }
        )

    manifest = (
        slim.repartition(shards, F.col(key_col))
        .sortWithinPartitions(key_col)
        .mapInPandas(write_partition, schema=out_schema)
        .collect()  # bounded by `shards`; this action IS the write
    )
    rows = sorted((r.asDict() for r in manifest), key=lambda m: m["shard"])
    # persisted next to the shards: the read side verifies per-shard
    # sample counts against it — tar corruption mid-archive makes
    # Python's tarfile SILENTLY end iteration (an invalid header block
    # reads as end-of-archive), so without the manifest a truncated
    # shard loses samples without any error
    with open(os.path.join(path, "manifest.jsonl"), "w") as f:
        for m in rows:
            f.write(json.dumps(m, sort_keys=True) + "\n")
    return rows


def _export_epoch(
    batch_df: DataFrame,
    epoch_id: int,
    path: str,
    key_col: str,
    members: dict[str, str],
    shards: int,
    meta_cols: list[str] | None,
) -> None:
    """One micro-batch → one ``batch=NNNNNN`` shard directory, written
    under a temp name and renamed in atomically: Structured Streaming
    re-runs a failed epoch, so a retry must REPLACE partial output, not
    duplicate samples.  Shard membership inside the epoch is the same
    pure key-hash function as the batch writer, so a replayed epoch is
    byte-identical."""
    import shutil

    final = os.path.join(path, f"batch={epoch_id:06d}")
    # dot-prefixed temp: a crashed epoch must not leave a
    # `batch=NNNNNN.tmp` directory that the consumer glob `batch=*`
    # would match — a torn partial epoch with no manifest yet reads
    # SILENTLY short (the manifest lands last)
    tmp = os.path.join(path, f".tmp-batch-{epoch_id:06d}")
    shutil.rmtree(tmp, ignore_errors=True)
    write_webdataset(
        batch_df, tmp, key_col=key_col, members=members, shards=shards,
        meta_cols=meta_cols,
    )
    shutil.rmtree(final, ignore_errors=True)
    os.rename(tmp, final)


def stream_webdataset_export(
    stream: DataFrame,
    path: str,
    key_col: str,
    members: dict[str, str],
    shards: int = 4,
    meta_cols: list[str] | None = None,
):
    """Continuous corpus export: a streaming sink that lands every
    micro-batch as a WebDataset shard directory
    (``<path>/batch=000042/shard-*.tar``) — the training-side handoff
    for a live ingest pipeline (stream in, filtered/deduped shards out;
    compose upstream with the streaming dedup/quality operators).

    Exactly-once per epoch via write-to-temp + atomic rename
    (:func:`_export_epoch`); dataloaders consume ``batch=*/*.tar`` and
    new epochs appear atomically.  Returns a ``DataStreamWriter`` —
    caller adds trigger/checkpoint and ``.start()``, like the
    incremental sync sink (streaming/sync.py)."""

    def _export(batch_df: DataFrame, epoch_id: int) -> None:
        _export_epoch(
            batch_df, epoch_id, path, key_col, members, shards, meta_cols
        )

    return stream.writeStream.foreachBatch(_export).outputMode("append")


def iter_tar_samples(
    buf_or_path, want: set[str]
) -> Iterator[tuple[str, dict[str, bytes]]]:
    """Stream (key, {ext: bytes}) samples from one tar shard, grouping
    the consecutive members that share a basename key (the WebDataset
    sample rule: key = name up to the FIRST dot, extension = the rest).
    Accepts a filesystem path or a bytes-like object (object-store
    blobs via binaryFile)."""
    if isinstance(buf_or_path, (bytes, bytearray, memoryview)):
        tar = tarfile.open(fileobj=io.BytesIO(bytes(buf_or_path)), mode="r")
    else:
        tar = tarfile.open(buf_or_path, mode="r")
    with tar:
        cur_key: str | None = None
        cur: dict[str, bytes] = {}
        for ti in tar:
            if not ti.isfile():
                continue
            base = os.path.basename(ti.name)
            key, _, ext = base.partition(".")
            if key != cur_key:
                if cur_key is not None:
                    yield cur_key, cur
                cur_key, cur = key, {}
            if ext in want:
                f = tar.extractfile(ti)
                cur[ext] = f.read() if f is not None else b""
        if cur_key is not None:
            yield cur_key, cur


def read_webdataset(
    spark: SparkSession,
    path: str,
    members: dict[str, str],
    text_exts: set[str] | None = None,
    key_out: str = "sample_key",
    on_error: str = "fail",
) -> DataFrame:
    """Read a WebDataset shard directory back as one row per sample.

    ``members`` maps extension → output column (binary; extensions in
    ``text_exts`` decode utf-8 to string — pass the ``.json`` metadata
    extension here and parse with ``F.from_json``).  Absent members are
    null.  One task per shard: the shard list is a pruned binaryFile
    scan (``path`` only — no blob shipping), each task streams its tar
    sequentially and yields bounded Arrow batches.

    Corruption handling: Python's tarfile treats an invalid header
    block mid-archive as END-OF-ARCHIVE (measured: garbage over a
    header yields the preceding samples and NO error), so truncation
    is usually SILENT.  Detection therefore comes from the writer's
    ``manifest.jsonl`` (written by :func:`write_webdataset` next to
    the shards): each task compares its decoded sample count to the
    manifest row.  ``on_error="fail"`` (default) raises on a mismatch
    or decode error; ``"quarantine"`` keeps the decodable prefix,
    appends the shard to ``_quarantine.jsonl`` (the re-fetch
    worklist — tar has no redundancy past the corruption point), and
    continues — the corpus-import posture (sources/jsonl.py's
    corrupt-record mode) for tars.  A foreign corpus without a
    manifest gets exception-based detection only.
    """
    if on_error not in ("fail", "quarantine"):
        raise ValueError(f"unknown on_error {on_error!r}")
    text_exts = text_exts or set()
    fields = [StructField(key_out, StringType())]
    for ext, col in members.items():
        fields.append(
            StructField(col, StringType() if ext in text_exts else BinaryType())
        )
    schema = StructType(fields)
    want = set(members)
    exts = dict(members)

    paths = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(path)
        .select("path")  # prunes `content`: listing only, no blob read
    )

    def read_shards(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def flush(rows: list[dict]) -> "pd.DataFrame":
            return pd.DataFrame(rows, columns=[f.name for f in schema.fields])

        # manifest resolved NEXT TO each shard (cached per directory),
        # so multi-directory reads — e.g. the streaming export's
        # ``batch=*`` epoch dirs, each with its own manifest — are
        # verified too, not just single-directory corpora
        manifests: dict[str, dict[str, int]] = {}

        def expected_for(local: str) -> "int | None":
            d = os.path.dirname(local)
            if d not in manifests:
                exp: dict[str, int] = {}
                mpath = os.path.join(d, "manifest.jsonl")
                if os.path.exists(mpath):
                    with open(mpath) as f:
                        for line in f:
                            m = json.loads(line)
                            exp[m["shard"]] = int(m["samples"])
                manifests[d] = exp
            return manifests[d].get(os.path.basename(local))

        for pdf in batches:
            for uri in pdf["path"]:
                local = uri[len("file:") :] if uri.startswith("file:") else uri
                shard = os.path.basename(local)
                rows: list[dict] = []
                n_decoded, err = 0, None
                it = iter_tar_samples(local, want)
                while True:
                    try:
                        key, got = next(it)
                    except StopIteration:
                        break
                    except (tarfile.TarError, OSError, EOFError) as e:
                        err = str(e)
                        break
                    rec = {key_out: key}
                    try:
                        # decode INSIDE the guarded loop: a corrupt text
                        # member routes through the same err/quarantine
                        # path as a torn tar, keeping the decodable
                        # prefix instead of failing the whole read
                        for ext, col in exts.items():
                            v = got.get(ext)
                            if v is not None and ext in text_exts:
                                v = v.decode("utf-8")
                            rec[col] = v
                    except UnicodeDecodeError as e:
                        err = f"utf-8 decode failed in sample {key!r}: {e}"
                        break
                    n_decoded += 1
                    rows.append(rec)
                    if len(rows) >= _READ_BATCH_SAMPLES:
                        yield flush(rows)
                        rows = []
                want_n = expected_for(local)
                if err is None and want_n is not None and n_decoded != want_n:
                    # tarfile read a corrupt header as end-of-archive:
                    # the loss is silent without this manifest check
                    err = (
                        f"sample count mismatch: decoded {n_decoded}, "
                        f"manifest says {want_n}"
                    )
                if err is not None:
                    if on_error == "fail":
                        raise IOError(f"corrupt shard {shard}: {err}")
                    with open(
                        os.path.join(os.path.dirname(local), "_quarantine.jsonl"),
                        "a",
                    ) as f:
                        f.write(
                            json.dumps({"shard": shard, "error": err}) + "\n"
                        )
                if rows:
                    yield flush(rows)

    # one shard per task: round-robin to exactly n partitions (a key
    # hash would collide shards into one task and idle another; the
    # explicit width also keeps AQE from coalescing the tiny path list
    # under its compute-amplifying consumer — SCALE.md round-9).
    # Capped at 4096: past that, tasks stream several shards
    # sequentially instead of flooding the scheduler with a
    # one-partition-per-shard plan on million-shard corpora.
    n = paths.count()
    if n == 0:
        return spark.createDataFrame([], schema)
    return paths.repartition(min(n, 4096)).mapInPandas(
        read_shards, schema=schema
    )
