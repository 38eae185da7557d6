"""Multimodal columns: image/audio/video as opaque ``binary`` with typed
metadata; decode / feature-extract / resize / frame-sample as
Arrow-batched Pandas functions over ``mapInPandas``.

The container has no image/audio libraries, so the actual codec step is
STUBBED (clearly marked below): ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case it produces
a deterministic fake decode derived from the bytes.  Everything around
the stub — schema handling, binary column construction, batch iteration
shape, partition-parallel execution — is real and tested, so swapping a
real decoder in (PIL/ffmpeg in the UDF body) changes one function.

Scale notes: mapInPandas streams Arrow record batches, so per-executor
memory is bounded by batch size, not partition size
(``spark.sql.execution.arrow.maxRecordsPerBatch``); binary payloads
ride the same columnar path.  Feature extraction (byte histogram) is
vectorized numpy over the batch.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MEDIA_SCHEMA = (
    "media_id long, media_type string, n_bytes long, width int, height int"
)


def with_binary_payload(
    df: DataFrame, src_col: str, out_col: str = "payload", media_type: str = "image/fake"
) -> DataFrame:
    """Build an opaque binary column + typed metadata from a source
    column (test harness: re-encode text; production: read raw files)."""
    payload = F.encode(F.col(src_col), "utf-8")
    return (
        df.withColumn(out_col, payload)
        .withColumn("media_type", F.lit(media_type))
        .withColumn("n_bytes", F.octet_length(payload).cast("long"))
    )


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """STUB — no image codec in this environment.

    With ``fake=True`` returns a deterministic pseudo-decode
    (dimensions derived from the byte length); otherwise raises.
    A real deployment replaces this body with PIL/turbojpeg.
    """
    if not fake:
        raise NotImplementedError("no image codec available in this environment")
    n = len(payload)
    width = max(1, n % 64)
    height = max(1, (n // 64) % 64)
    return {"width": width, "height": height}


def extract_media_features(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    fake_decode: bool = True,
) -> DataFrame:
    """Decode metadata (stubbed) + byte-histogram feature vector per
    media row, as one Arrow-batched pass."""
    import pandas as pd  # noqa: F401 — imported for the executor context

    schema = f"{id_col} long, width int, height int, n_bytes long, features array<double>"

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, widths, heights, sizes, feats = [], [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(payload)
                meta = decode_image(buf, fake=fake_decode)
                arr = np.frombuffer(buf, dtype=np.uint8)
                hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(
                    "float64"
                )
                total = hist.sum()
                ids.append(mid)
                widths.append(meta["width"])
                heights.append(meta["height"])
                sizes.append(len(buf))
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "width": widths,
                    "height": heights,
                    "n_bytes": sizes,
                    "features": feats,
                }
            )

    from pedsnetdcc_spark.util import ensure_parallelism

    src = ensure_parallelism(df.select(id_col, payload_col))
    return src.mapInPandas(op, schema=schema)


def sample_frames(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    every_n_bytes: int = 64,
) -> DataFrame:
    """Frame-sampling plumbing demo: slice the binary payload into
    fixed-stride "frames" (stand-in for video frame extraction) —
    pure built-in expressions, one output row per frame."""
    n_frames = F.greatest(
        F.lit(1), F.floor(F.octet_length(payload_col) / every_n_bytes)
    ).cast("int")
    idx = F.explode(F.sequence(F.lit(0), n_frames - 1))
    out = df.select(F.col(id_col), F.col(payload_col), idx.alias("frame_idx"))
    frame = F.substring(
        F.col(payload_col), F.col("frame_idx") * every_n_bytes + 1, every_n_bytes
    )
    return out.select(
        id_col, "frame_idx", frame.alias("frame_bytes")
    )
