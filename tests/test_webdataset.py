"""WebDataset-style sharded tar sink/source (sources/webdataset.py).

The reference has no multimodal/corpus-export surface; this is the
engine's training-data extension family.  Checks: lossless round-trip
(text + PNG binary + json metadata), deterministic byte-identical
shards independent of input partitioning (membership = pure function
of the key), sample adjacency inside each shard, null-member handling,
and manifest accounting.
"""

from __future__ import annotations

import hashlib
import json
import os
import tarfile

import pytest

from pedsnetdcc_spark.datapipe.multimodal import encode_png
from pedsnetdcc_spark.sources.webdataset import (
    iter_tar_samples,
    read_webdataset,
    write_webdataset,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(57):
        px = bytes((i + j) % 256 for j in range(4 * 3))
        rows.append(
            (
                f"{i:06d}",
                f"document {i} text\nwith a second line",
                encode_png(4, 3, px, channels=1),
                i % 5,
                float(i) / 2,
            )
        )
    return spark.createDataFrame(
        rows, "doc_id string, text string, image binary, label int, score double"
    )


def _write(corpus, path):
    return write_webdataset(
        corpus,
        path,
        key_col="doc_id",
        members={"txt": "text", "png": "image"},
        shards=4,
        meta_cols=["label", "score"],
    )


def test_roundtrip_lossless(spark, corpus, tmp_path):
    out = str(tmp_path / "wds")
    manifest = _write(corpus, out)
    assert sorted(m["shard"] for m in manifest) == [
        f"shard-{i:06d}.tar" for i in range(4)
    ]
    assert sum(m["samples"] for m in manifest) == 57
    # 2 content members + 1 json metadata member per sample
    assert sum(m["members"] for m in manifest) == 57 * 3
    back = read_webdataset(
        spark,
        out,
        members={"txt": "text", "png": "image", "json": "meta"},
        text_exts={"txt", "json"},
    )
    got = {r["sample_key"]: r for r in back.collect()}
    assert len(got) == 57
    for r in corpus.collect():
        b = got[r["doc_id"]]
        assert b["text"] == r["text"]
        assert bytes(b["image"]) == bytes(r["image"])
        meta = json.loads(b["meta"])
        assert meta == {"label": r["label"], "score": r["score"]}


def test_shards_deterministic_and_membership_pure(corpus, tmp_path):
    """Byte-identical shards regardless of how the input arrived
    partitioned — shard membership is a pure function of the key."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _write(corpus, a)
    _write(corpus.repartition(13).sortWithinPartitions("score"), b)

    def digests(d):
        return {
            f: hashlib.sha256(open(os.path.join(d, f), "rb").read()).hexdigest()
            for f in sorted(os.listdir(d))
        }

    da, db = digests(a), digests(b)
    assert da == db  # shards AND the manifest byte-identical
    assert sum(f.endswith(".tar") for f in da) == 4


def test_sample_members_adjacent_in_shard(corpus, tmp_path):
    """The WebDataset sample rule: a sample's members are CONSECUTIVE
    tar entries — verified with plain tarfile, no engine code."""
    out = str(tmp_path / "wds")
    _write(corpus, out)
    total = 0
    for f in [x for x in os.listdir(out) if x.endswith(".tar")]:
        with tarfile.open(os.path.join(out, f)) as tar:
            names = [m.name for m in tar if m.isfile()]
        keys = [n.partition(".")[0] for n in names]
        # each key appears exactly once as a consecutive run
        seen, prev = set(), None
        for k in keys:
            if k != prev:
                assert k not in seen, f"non-adjacent sample {k} in {f}"
                seen.add(k)
                prev = k
        total += len(seen)
    assert total == 57


def test_null_member_skipped(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "has text", None), ("b", None, b"\x01\x02")],
        "doc_id string, text string, image binary",
    )
    out = str(tmp_path / "wds")
    m = write_webdataset(
        df, out, key_col="doc_id", members={"txt": "text", "png": "image"},
        shards=1,
    )
    assert m[0]["samples"] == 2 and m[0]["members"] == 2
    back = read_webdataset(
        spark, out, members={"txt": "text", "png": "image"}, text_exts={"txt"}
    ).collect()
    by_key = {r["sample_key"]: r for r in back}
    assert by_key["a"]["text"] == "has text" and by_key["a"]["image"] is None
    assert by_key["b"]["text"] is None and bytes(by_key["b"]["image"]) == b"\x01\x02"


def test_non_content_member_column_rejected(spark, tmp_path):
    """An int member column must be rejected at plan time: bytes(5)
    writes five ZERO bytes — silent corruption, not an encoding."""
    df = spark.createDataFrame([("a", 5)], "doc_id string, n int")
    with pytest.raises(ValueError, match="string or binary"):
        write_webdataset(
            df, str(tmp_path / "x"), key_col="doc_id",
            members={"num": "n"}, shards=1,
        )


def test_iter_tar_samples_accepts_blob(corpus, tmp_path):
    """Object-store path: the same decoder runs on in-memory blobs
    (binaryFile `content`), not just POSIX paths."""
    out = str(tmp_path / "wds")
    _write(corpus, out)
    f = sorted(x for x in os.listdir(out) if x.endswith(".tar"))[0]
    blob = open(os.path.join(out, f), "rb").read()
    from_path = list(iter_tar_samples(os.path.join(out, f), {"txt", "png"}))
    from_blob = list(iter_tar_samples(blob, {"txt", "png"}))
    assert from_path == from_blob and len(from_blob) > 0


def test_streaming_filter_compose_into_export(spark, tmp_path):
    """The composition the sink's docstring advertises — stream in,
    quality-filter, WebDataset shards out: the exported sample set
    equals the batch filter's keeper set."""
    import os

    from pedsnetdcc_spark.datapipe.text import gopher_rules
    from pedsnetdcc_spark.sources.webdataset import stream_webdataset_export

    rows = [
        (f"{i:04d}",
         ("the quick brown fox jumps over the lazy dog and then some "
          * 6) if i % 3 else "short")   # 1/3 fail the min-words rule
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    src = str(tmp_path / "src")
    docs.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    filtered = (
        gopher_rules(stream, "text")
        .where("passes_gopher")
        .select("doc_id", "text")
    )
    out = str(tmp_path / "out")
    q = (
        stream_webdataset_export(
            filtered, out, key_col="doc_id", members={"txt": "text"}, shards=2
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["sample_key"]
        for r in read_webdataset(
            spark, f"{out}/batch=*", members={"txt": "text"}
        ).collect()
    }
    want = {
        r["doc_id"]
        for r in gopher_rules(docs, "text").where("passes_gopher").collect()
    }
    assert got == want and len(want) == 20


def test_iter_tar_samples_property():
    """Property: for ANY member layout (random unique keys, random
    extension subsets, random binary payloads incl. empty), grouping
    by consecutive basename key recovers exactly the samples whose
    extensions were requested — pure-python, no Spark."""
    import io
    import tarfile as tf

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pedsnetdcc_spark.sources.webdataset import _tarinfo

    exts = ["txt", "png", "json", "cls"]
    sample = st.tuples(
        st.from_regex(r"[A-Za-z0-9_-]{1,12}", fullmatch=True),
        st.dictionaries(
            st.sampled_from(exts),
            st.binary(min_size=0, max_size=64),
            min_size=1,
            max_size=4,
        ),
    )

    @settings(max_examples=50, deadline=None)
    @given(st.lists(sample, max_size=12, unique_by=lambda s: s[0]))
    def check(samples):
        buf = io.BytesIO()
        with tf.open(fileobj=buf, mode="w") as tar:
            for key, members in samples:
                for ext in sorted(members):
                    data = members[ext]
                    tar.addfile(_tarinfo(f"{key}.{ext}", len(data)), io.BytesIO(data))
        want = {"txt", "json"}
        got = dict(iter_tar_samples(buf.getvalue(), want))
        assert list(got) == [k for k, _ in samples]
        for key, members in samples:
            assert got[key] == {e: b for e, b in members.items() if e in want}

    check()


def test_read_plan_has_no_row_udfs(spark, corpus, tmp_path):
    out = str(tmp_path / "wds")
    _write(corpus, out)
    back = read_webdataset(spark, out, members={"txt": "text"})
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # Arrow-batched, never per-row


def test_corrupt_shard_quarantine(spark, corpus, tmp_path):
    """A truncated tar under on_error="quarantine" keeps the intact
    shards' samples (plus the corrupt shard's decodable prefix), logs
    the shard to _quarantine.jsonl, and the default mode still fails
    loudly."""
    import json
    import os

    out = str(tmp_path / "wds")
    _write(corpus, out)
    victim = os.path.join(
        out, sorted(x for x in os.listdir(out) if x.endswith(".tar"))[0]
    )
    blob = open(victim, "rb").read()
    # cut INSIDE the member data (tar pads the tail with zero blocks,
    # so a half-cut can be lossless — measured; 1024 bytes keeps at
    # most the first member): tarfile reads this as a SILENT early
    # end-of-archive, which only the manifest count check detects
    open(victim, "wb").write(blob[:1024])

    with pytest.raises(Exception, match="corrupt shard"):
        read_webdataset(spark, out, members={"txt": "text"}).count()

    back = read_webdataset(
        spark, out, members={"txt": "text"}, text_exts={"txt"},
        on_error="quarantine",
    ).collect()
    intact = {
        r["sample_key"] for r in read_webdataset(
            spark, f"{out}/shard-00000[1-3].tar", members={"txt": "text"}
        ).collect()
    }
    got = {r["sample_key"] for r in back}
    assert intact <= got < {r["doc_id"] for r in corpus.collect()}
    q = [json.loads(l) for l in open(os.path.join(out, "_quarantine.jsonl"))]
    assert [e["shard"] for e in q] == [os.path.basename(victim)]


def test_streaming_export_matches_batch_and_retries_idempotently(
    spark, corpus, tmp_path
):
    """The streaming corpus sink: two micro-batches land as two
    atomic ``batch=N`` shard dirs whose union equals the input; and a
    REPLAYED epoch (Structured Streaming retry semantics) leaves
    byte-identical output instead of duplicating samples."""
    import hashlib
    import os

    from pedsnetdcc_spark.sources.webdataset import (
        _export_epoch,
        stream_webdataset_export,
    )

    src = str(tmp_path / "src")
    # two source files -> two micro-batches under maxFilesPerTrigger=1
    corpus.filter("label < 2").coalesce(1).write.parquet(src)
    corpus.filter("label >= 2").coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = str(tmp_path / "stream_out")
    q = (
        stream_webdataset_export(
            stream, out, key_col="doc_id", members={"txt": "text"}, shards=2
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batches = sorted(d for d in os.listdir(out) if d.startswith("batch="))
    assert len(batches) == 2 and not any(d.endswith(".tmp") for d in batches)
    back = read_webdataset(
        spark, f"{out}/batch=*", members={"txt": "text"}, text_exts={"txt"}
    )
    got = {(r["sample_key"], r["text"]) for r in back.collect()}
    want = {(r["doc_id"], r["text"]) for r in corpus.collect()}
    assert got == want

    # retry idempotence: re-export epoch 0 with the SAME rows — output
    # files byte-identical, sample count unchanged
    def digest(d):
        return {
            f: hashlib.sha256(
                open(os.path.join(out, d, f), "rb").read()
            ).hexdigest()
            for f in sorted(os.listdir(os.path.join(out, d)))
        }

    before = digest(batches[0])
    _export_epoch(
        corpus.filter("label < 2"), 0, out, "doc_id", {"txt": "text"}, 2, None
    )
    assert digest(batches[0]) == before


def test_key_with_dot_or_separator_rejected(spark, tmp_path):
    """The reader splits member names at the FIRST dot, so a key like
    'v1.2' would read back as key 'v1' with extension '2.txt' — content
    silently dropped under a wrong key.  The writer must refuse."""
    for i, bad in enumerate(("v1.2", "a/b", "a\\b")):
        df = spark.createDataFrame([(bad, "t")], "doc_id string, text string")
        with pytest.raises(Exception, match="sample key"):
            write_webdataset(
                df, str(tmp_path / f"wds{i}"),
                key_col="doc_id", members={"txt": "text"}, shards=1,
            )


def test_write_refuses_nonempty_target_and_overwrite_cleans(
    spark, corpus, tmp_path
):
    """Re-exporting with fewer shards into an existing directory would
    leave stale shard-*.tar files absent from the rewritten manifest —
    the reader would resurrect their samples undetected.  Default mode
    refuses; mode='overwrite' removes the prior export first."""
    out = str(tmp_path / "wds")
    _write(corpus, out)  # 4 shards
    with pytest.raises(IOError, match="already holds"):
        _write(corpus, out)
    small = corpus.limit(10)
    write_webdataset(
        small, out, key_col="doc_id", members={"txt": "text"},
        shards=2, mode="overwrite",
    )
    tars = sorted(p for p in os.listdir(out) if p.endswith(".tar"))
    assert tars == ["shard-000000.tar", "shard-000001.tar"]  # no stale 2,3
    back = read_webdataset(
        spark, out, members={"txt": "text"}, text_exts={"txt"}
    )
    assert back.count() == 10


def test_two_attempts_never_interleave_one_shard(tmp_path):
    """The task-commit invariant (module docstring): a speculative or
    zombie attempt racing the winner must not interleave bytes into the
    final shard.  Simulate attempt A paused mid-stream while attempt B
    writes the same partition and commits; whichever order the commits
    land, the final path is a COMPLETE single-attempt tar and no temp
    files leak."""
    import threading

    from pedsnetdcc_spark.sources.webdataset import _write_shard

    out = str(tmp_path / "wds")
    os.makedirs(out)
    rows = [{"k": f"{i:04d}", "t": f"text {i}"} for i in range(20)]

    gate_a_started = threading.Event()
    gate_b_done = threading.Event()

    def recs_a():
        for i, r in enumerate(rows):
            if i == 10:
                gate_a_started.set()
                assert gate_b_done.wait(30)  # B fully commits mid-A
            yield r

    res = {}

    def run_a():
        res["a"] = _write_shard(
            out, "shard-000000.tar", 1, recs_a(), "k",
            {"txt": "t"}, {"t"}, [],
        )

    ta = threading.Thread(target=run_a)
    ta.start()
    assert gate_a_started.wait(30)
    res["b"] = _write_shard(
        out, "shard-000000.tar", 2, iter(rows), "k", {"txt": "t"}, {"t"}, [],
    )
    gate_b_done.set()
    ta.join(30)

    assert res["a"] == res["b"] == (20, 20, res["a"][2])
    final = os.path.join(out, "shard-000000.tar")
    got = dict(
        (k, m["txt"]) for k, m in iter_tar_samples(final, {"txt"})
    )
    assert got == {r["k"]: r["t"].encode() for r in rows}  # complete tar
    assert [p for p in os.listdir(out) if p.endswith(".tmp")] == []


def test_corrupt_text_member_quarantines(spark, tmp_path):
    """A non-utf8 byte sequence in a text_exts member must route
    through the quarantine path (keeping the decodable prefix), not
    abort the whole read with UnicodeDecodeError."""
    df = spark.createDataFrame(
        [("000000", b"good text"), ("000001", b"\xff\xfe broken")],
        "doc_id string, payload binary",
    )
    out = str(tmp_path / "wds")
    write_webdataset(
        df, out, key_col="doc_id", members={"txt": "payload"}, shards=1
    )
    with pytest.raises(Exception, match="decode failed"):
        read_webdataset(
            spark, out, members={"txt": "text"}, text_exts={"txt"}
        ).count()
    back = read_webdataset(
        spark, out, members={"txt": "text"}, text_exts={"txt"},
        on_error="quarantine",
    ).collect()
    assert [(r["sample_key"], r["text"]) for r in back] == [
        ("000000", "good text")
    ]
    q = [json.loads(l) for l in open(os.path.join(out, "_quarantine.jsonl"))]
    assert len(q) == 1 and "decode failed" in q[0]["error"]


def test_crashed_epoch_temp_invisible_to_consumers(spark, corpus, tmp_path):
    """A crashed epoch's partial temp directory must not match the
    consumer glob batch=* — without the dot prefix a torn epoch with no
    manifest yet reads silently short."""
    import shutil

    from pedsnetdcc_spark.sources.webdataset import _export_epoch

    out = str(tmp_path / "out")
    _export_epoch(corpus.limit(10), 0, out, "doc_id", {"txt": "text"}, 2, None)
    # simulate a crashed epoch 1: partial shards, no manifest, no rename
    crashed = os.path.join(out, ".tmp-batch-000001")
    os.makedirs(crashed)
    shutil.copy(
        os.path.join(out, "batch=000000", "shard-000000.tar"),
        os.path.join(crashed, "shard-000000.tar"),
    )
    got = read_webdataset(
        spark, f"{out}/batch=*", members={"txt": "text"}, text_exts={"txt"}
    )
    assert got.count() == 10  # only the committed epoch
    # and the retry replaces the debris with a complete epoch
    _export_epoch(corpus.limit(4), 1, out, "doc_id", {"txt": "text"}, 2, None)
    got = read_webdataset(
        spark, f"{out}/batch=*", members={"txt": "text"}, text_exts={"txt"}
    )
    assert got.count() == 14
