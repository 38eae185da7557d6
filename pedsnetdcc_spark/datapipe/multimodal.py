"""Multimodal columns: image/audio/video as opaque ``binary`` with typed
metadata; decode / feature-extract / resize / frame-sample as
Arrow-batched Pandas functions over ``mapInPandas``.

The decode path is REAL for PNG / BMP / GIF:

- header parsing (width / height / bit depth / color type) is a pure
  byte-level parse of the container format — no codec library needed;
- PNG pixel decode (zlib inflate + scanline un-filtering, all five PNG
  filter types) is implemented with stdlib ``zlib`` + numpy, for
  greyscale/RGB/RGBA 8-bit images — the formats the test harness
  round-trips through :func:`encode_png`.

Entropy-coded formats (JPEG, WebP, video codecs) genuinely need a codec
library this container doesn't ship; for those ``decode_image`` raises
``NotImplementedError`` unless ``fake=True`` supplies the deterministic
fallback.  Swapping in PIL/turbojpeg changes one function.

Scale notes: mapInPandas streams Arrow record batches, so per-executor
memory is bounded by batch size, not partition size
(``spark.sql.execution.arrow.maxRecordsPerBatch``); binary payloads
ride the same columnar path.  Feature extraction (pixel/byte histogram)
is vectorized numpy over the batch.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# PNG color type -> samples per pixel (8-bit depth assumed by the decoder)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


# ---------------------------------------------------------------------------
# Minimal real PNG codec (pure stdlib + numpy).
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, channels: int = 1) -> bytes:
    """Encode a real, spec-conformant PNG (8-bit; greyscale ``channels=1``,
    RGB ``3``, RGBA ``4``) with filter type 0 scanlines.  ``pixels`` must
    hold ``width * height * channels`` bytes, row-major."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(f"need {stride * height} bytes, got {len(pixels)}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        # level 1: the harness encodes in bulk and any conformant
        # deflate stream is a valid PNG — decode cost is unaffected
        + _png_chunk(b"IDAT", zlib.compress(raw, 1))
        + _png_chunk(b"IEND", b"")
    )


def parse_image_header(buf: bytes) -> dict | None:
    """Parse PNG / BMP / GIF container headers (magic + fixed-offset
    fields) into ``{format, width, height, bit_depth, channels}``.
    Returns ``None`` for unrecognized bytes."""
    if buf[:8] == PNG_SIG and len(buf) >= 33 and buf[12:16] == b"IHDR":
        w, h, depth, color = struct.unpack(">IIBB", buf[16:26])
        return {
            "format": "png",
            "width": w,
            "height": h,
            "bit_depth": depth,
            "channels": _PNG_CHANNELS.get(color, 1),
        }
    if buf[:2] == b"BM" and len(buf) >= 30:
        # BITMAPINFOHEADER: width int32 LE @18, height int32 LE @22
        # (negative height = top-down), bpp uint16 LE @28.
        w, h = struct.unpack("<ii", buf[18:26])
        bpp = struct.unpack("<H", buf[28:30])[0]
        return {
            "format": "bmp",
            "width": abs(w),
            "height": abs(h),
            "bit_depth": min(bpp, 8),
            "channels": max(1, bpp // 8),
        }
    if buf[:6] in (b"GIF87a", b"GIF89a") and len(buf) >= 10:
        w, h = struct.unpack("<HH", buf[6:10])
        return {
            "format": "gif",
            "width": w,
            "height": h,
            "bit_depth": 8,
            "channels": 1,
        }
    return None


def _png_unfilter(raw: bytes, width: int, height: int, channels: int):
    """Reverse PNG scanline filtering (types 0-4: None, Sub, Up, Average,
    Paeth) for 8-bit samples.  Returns ``(height, width*channels)`` uint8
    numpy array."""
    import numpy as np

    stride = width * channels
    bpp = channels  # bytes per pixel at 8-bit depth
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).copy()
        pos += stride
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                left = out[y, x - bpp] if x >= bpp else 0
                out[y, x] = (int(line[x]) + int(left)) & 0xFF
        elif ftype == 2:  # Up
            out[y] = (line.astype(np.int16) + prev.astype(np.int16)).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(out[y, x - bpp]) if x >= bpp else 0
                out[y, x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(out[y, x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[y, x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype} on row {y}")
    return out


def decode_png(buf: bytes):
    """Real PNG decode for 8-bit non-interlaced images: walk chunks,
    inflate the IDAT stream, un-filter scanlines.  Returns
    ``(meta dict, pixels uint8 array of shape (h, w*channels))``."""
    meta = parse_image_header(buf)
    if meta is None or meta["format"] != "png":
        raise ValueError("not a PNG")
    if meta["bit_depth"] != 8:
        raise NotImplementedError("only 8-bit PNG supported")
    # interlace flag is IHDR byte 12 (offset 28 in file)
    if buf[28] != 0:
        raise NotImplementedError("interlaced PNG not supported")
    idat = b""
    pos = 8
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += buf[pos + 8 : pos + 8 + length]
        if tag == b"IEND":
            break
        pos += 12 + length  # len + tag + data + crc
    raw = zlib.decompress(idat)
    pixels = _png_unfilter(raw, meta["width"], meta["height"], meta["channels"])
    return meta, pixels


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """Decode image metadata (+ pixels where the pure-Python path can).

    PNG: full real decode (header + inflate + un-filter) → ``pixels``
    key holds the flat uint8 sample array.  BMP/GIF: real header parse
    (dimensions/depth); pixel data left opaque.  Unrecognized formats:
    deterministic fake when ``fake=True`` (so harness plumbing can run
    on arbitrary bytes), else ``NotImplementedError`` — JPEG-class
    entropy decoding needs a codec library this container doesn't have.
    """
    hdr = parse_image_header(bytes(payload))
    if hdr is not None:
        if hdr["format"] == "png":
            try:
                meta, pixels = decode_png(bytes(payload))
                return {**meta, "pixels": pixels}
            except (NotImplementedError, ValueError, zlib.error, IndexError):
                # unsupported variant OR corrupt body past a valid header
                # (truncated IDAT → zlib.error, bad filter/short scanline
                # → ValueError/IndexError): degrade to header-only rather
                # than failing the whole task
                return hdr
        return hdr
    if not fake:
        raise NotImplementedError(
            "unrecognized image format; no entropy codec in this environment"
        )
    n = len(payload)
    return {
        "format": "fake",
        "width": max(1, n % 64),
        "height": max(1, (n // 64) % 64),
        "bit_depth": 8,
        "channels": 1,
    }


# ---------------------------------------------------------------------------
# Minimal real WAV (RIFF/PCM) codec — audio as a first-class binary column.
# ---------------------------------------------------------------------------


def encode_wav(
    samples: bytes, sample_rate: int = 8000, channels: int = 1, bits: int = 16
) -> bytes:
    """Encode a spec-conformant PCM WAV container around raw sample
    bytes (``len(samples)`` must be a multiple of ``bits//8 *
    channels``)."""
    block = channels * bits // 8
    if len(samples) % block:
        raise ValueError(f"sample bytes not a multiple of block size {block}")
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(samples)) + samples
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> dict:
    """Real WAV decode: walk RIFF chunks, parse the fmt chunk, return
    ``{format, channels, sample_rate, bit_depth, n_samples, samples}``
    with ``samples`` an int16/uint8 numpy array for PCM payloads."""
    import numpy as np

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        tag = buf[pos : pos + 4]
        (length,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        chunk = buf[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif tag == b"data":
            data = chunk
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    codec, channels, rate, _, _, bits = fmt
    if codec != 1:
        raise NotImplementedError(f"non-PCM WAV codec {codec}")
    dtype = {8: np.uint8, 16: np.int16}.get(bits)
    if dtype is None:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    samples = np.frombuffer(data, dtype=dtype)
    return {
        "format": "wav",
        "channels": channels,
        "sample_rate": rate,
        "bit_depth": bits,
        "n_samples": len(samples) // max(channels, 1),
        "samples": samples,
    }


# ---------------------------------------------------------------------------
# Spark plumbing.
# ---------------------------------------------------------------------------


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


def with_png_payload(
    df: DataFrame, id_col: str, src_col: str, out_col: str = "payload"
) -> DataFrame:
    """Harness payload builder producing REAL PNGs: each row's text bytes
    become the greyscale pixel data of a deterministic-dimension image
    (width = 1 + len % 61, height = ceil(len / width)), encoded through
    :func:`encode_png`.  Arrow-batched mapInPandas — the per-row Python
    cost IS the codec work, same as production ingest."""
    import pandas as pd  # noqa: F401

    schema = f"{id_col} long, {out_col} binary, media_type string, n_bytes long"

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, payloads, sizes = [], [], []
            for rid, text in zip(pdf[id_col], pdf[src_col]):
                data = str(text).encode("utf-8")
                width = 1 + len(data) % 61
                height = max(1, -(-len(data) // width))
                padded = data.ljust(width * height, b"\x00")
                png = encode_png(width, height, padded, channels=1)
                ids.append(rid)
                payloads.append(png)
                sizes.append(len(png))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    out_col: payloads,
                    "media_type": ["image/png"] * len(ids),
                    "n_bytes": sizes,
                }
            )

    from pedsnetdcc_spark.util import ensure_parallelism

    return ensure_parallelism(df.select(id_col, src_col)).mapInPandas(op, schema=schema)


def extract_media_features(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    fake_decode: bool = True,
    normalize: bool = True,
) -> DataFrame:
    """Decode metadata (real for PNG/BMP/GIF) + histogram feature vector
    per media row, as one Arrow-batched pass.  The histogram is over
    DECODED pixel samples when the pure-Python decode applies (PNG),
    else over raw payload bytes.  ``normalize=False`` returns raw
    integer bin counts (as doubles) — exact arithmetic, which is what
    makes the pipeline oracle-checkable end to end."""
    import pandas as pd  # noqa: F401 — imported for the executor context

    schema = (
        f"{id_col} long, fmt string, width int, height int, bit_depth int,"
        " n_bytes long, features array<double>"
    )

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, fmts, widths, heights, depths, sizes, feats = [], [], [], [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(payload)
                meta = decode_image(buf, fake=fake_decode)
                pix = meta.get("pixels")
                arr = (
                    pix.reshape(-1)
                    if pix is not None
                    else np.frombuffer(buf, dtype=np.uint8)
                )
                hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(
                    "float64"
                )
                total = hist.sum()
                ids.append(mid)
                fmts.append(meta["format"])
                widths.append(meta["width"])
                heights.append(meta["height"])
                depths.append(meta["bit_depth"])
                sizes.append(len(buf))
                feats.append(
                    (hist / total if total else hist).tolist()
                    if normalize
                    else hist.tolist()
                )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "fmt": fmts,
                    "width": widths,
                    "height": heights,
                    "bit_depth": depths,
                    "n_bytes": sizes,
                    "features": feats,
                }
            )

    from pedsnetdcc_spark.util import ensure_parallelism

    src = ensure_parallelism(df.select(id_col, payload_col))
    return src.mapInPandas(op, schema=schema)


def resize_images(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    out_width: int = 16,
    out_height: int = 16,
) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode, one Arrow-batched
    pass: each decodable PNG row becomes a ``out_width × out_height``
    greyscale PNG (multi-channel inputs take channel 0).  Non-PNG rows
    pass through with ``resized = false`` and the original payload — at
    100 TB you route by ``media_type`` first and keep the partition
    stream append-only.

    Real resample math (numpy integer index grid), real re-encode —
    the same shape a production thumbnail/normalization stage has."""
    import pandas as pd  # noqa: F401

    schema = f"{id_col} long, payload binary, width int, height int, resized boolean"

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, payloads, ws, hs, flags = [], [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(payload)
                hdr = parse_image_header(buf)
                decodable = hdr is not None and hdr["format"] == "png"
                if decodable:
                    try:
                        meta, pix = decode_png(buf)
                    except (NotImplementedError, ValueError, zlib.error, IndexError):
                        # unsupported (16-bit / interlaced) OR corrupt
                        # (truncated IDAT → zlib.error, bad filter byte /
                        # wrong pixel count → ValueError/IndexError):
                        # pass through rather than failing the task
                        decodable = False
                if decodable:
                    w, h, ch = meta["width"], meta["height"], meta["channels"]
                    grid = pix.reshape(h, w, ch)[:, :, 0]
                    ys = (np.arange(out_height) * h) // out_height
                    xs = (np.arange(out_width) * w) // out_width
                    small = grid[np.ix_(ys, xs)]
                    payloads.append(
                        encode_png(out_width, out_height, small.tobytes(), channels=1)
                    )
                    ws.append(out_width)
                    hs.append(out_height)
                    flags.append(True)
                else:
                    payloads.append(buf)
                    ws.append(hdr["width"] if hdr else 0)
                    hs.append(hdr["height"] if hdr else 0)
                    flags.append(False)
                ids.append(rid)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "payload": payloads,
                    "width": ws,
                    "height": hs,
                    "resized": flags,
                }
            )

    from pedsnetdcc_spark.util import ensure_parallelism

    return ensure_parallelism(df.select(id_col, payload_col)).mapInPandas(
        op, schema=schema
    )


def with_wav_payload(
    df: DataFrame, id_col: str, src_col: str, out_col: str = "payload"
) -> DataFrame:
    """Harness payload builder producing REAL PCM WAVs: each row's text
    bytes become 8-bit mono samples at 8 kHz through
    :func:`encode_wav`."""
    import pandas as pd  # noqa: F401

    schema = f"{id_col} long, {out_col} binary, media_type string, n_bytes long"

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, payloads, sizes = [], [], []
            for rid, text in zip(pdf[id_col], pdf[src_col]):
                data = str(text).encode("utf-8") or b"\x00"
                wav = encode_wav(data, sample_rate=8000, channels=1, bits=8)
                ids.append(rid)
                payloads.append(wav)
                sizes.append(len(wav))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    out_col: payloads,
                    "media_type": ["audio/wav"] * len(ids),
                    "n_bytes": sizes,
                }
            )

    from pedsnetdcc_spark.util import ensure_parallelism

    return ensure_parallelism(df.select(id_col, src_col)).mapInPandas(op, schema=schema)


def extract_audio_features(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """Real audio feature extraction over decoded PCM samples: duration,
    RMS level, zero-crossing count, peak amplitude — vectorized numpy
    per Arrow batch."""
    import pandas as pd  # noqa: F401

    schema = (
        f"{id_col} long, channels int, sample_rate int, bit_depth int,"
        " n_samples long, rms double, zero_crossings long, peak int"
    )

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                meta = decode_wav(bytes(payload))
                s = meta["samples"].astype(np.float64)
                if meta["bit_depth"] == 8:
                    s = s - 128.0  # uint8 PCM is offset-binary
                rows.append(
                    (
                        rid,
                        meta["channels"],
                        meta["sample_rate"],
                        meta["bit_depth"],
                        meta["n_samples"],
                        float(np.sqrt(np.mean(s * s))) if len(s) else 0.0,
                        int(np.count_nonzero(np.diff(np.signbit(s)))),
                        int(np.max(np.abs(s))) if len(s) else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "channels", "sample_rate", "bit_depth",
                    "n_samples", "rms", "zero_crossings", "peak",
                ],
            )

    from pedsnetdcc_spark.util import ensure_parallelism

    return ensure_parallelism(df.select(id_col, payload_col)).mapInPandas(
        op, schema=schema
    )


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


# ---------------------------------------------------------------------------
# Image near-dup: perceptual difference hash (dHash) + Hamming band join.
# ---------------------------------------------------------------------------


def _png_dhash64(buf: bytes) -> "tuple[int | None, bool]":
    """Per-buffer dHash: decode a PNG and compute the 64-bit perceptual
    difference hash (the row body of :func:`image_dhash`, shared with
    the fused :func:`png_dhash_pipeline`).  Returns ``(hash, ok)``;
    undecodable buffers yield ``(None, False)``."""
    import numpy as np

    hdr = parse_image_header(buf)
    if hdr is None or hdr["format"] != "png":
        return None, False
    try:
        meta, pix = decode_png(buf)
    except (NotImplementedError, ValueError, zlib.error, IndexError):
        return None, False
    w, h, ch = meta["width"], meta["height"], meta["channels"]
    grid = pix.reshape(h, w, ch)[:, :, 0].astype(np.int16)
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(9) * w) // 9
    small = grid[np.ix_(ys, xs)]
    bits = (small[:, :-1] > small[:, 1:]).ravel()
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    val = int((bits.astype(np.uint64) * weights).sum())
    if val >= 1 << 63:
        val -= 1 << 64  # two's-complement into a signed long
    return val, True


def image_dhash(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    out_col: str = "dhash",
) -> DataFrame:
    """Perceptual difference hash (dHash) per image: decode → channel-0
    grid → nearest-neighbor resample to 9×8 (the same integer index
    grid as :func:`resize_images`) → 64 horizontal-gradient bits
    (``left > right``, row-major, bit ``r*8+c``) packed into a signed
    64-bit long — scale-invariant by construction (any pixel-repetition
    upscale resamples to the identical 9×8 grid), which is what makes
    it the standard image near-dup signature.  Undecodable rows keep
    their row with ``decodable = false`` and a NULL hash.

    Returns ``(id, dhash, decodable)``.  One Arrow-batched pass; the
    per-row Python cost is the codec work, like the rest of the module.
    """
    import pandas as pd  # noqa: F401

    schema = f"{id_col} long, {out_col} long, decodable boolean"

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, hashes, flags = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                val, ok = _png_dhash64(bytes(payload))
                ids.append(rid)
                hashes.append(val)
                flags.append(ok)
            yield pd.DataFrame(
                {id_col: ids, out_col: hashes, "decodable": flags}
            )

    from pedsnetdcc_spark.util import ensure_parallelism

    return ensure_parallelism(df.select(id_col, payload_col)).mapInPandas(
        op, schema=schema
    )


def upscale_images(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    factor: int = 2,
) -> DataFrame:
    """Pixel-repetition upscale (decode → ``np.kron`` → re-encode), one
    Arrow-batched pass — the inverse-direction twin of
    :func:`resize_images`, used to manufacture true scale variants
    (``image_dhash`` of an upscale equals the original's exactly:
    ``((r·f·h)//8)//f == (r·h)//8`` for any integer factor).
    Undecodable rows pass through unchanged with ``resized = false``.
    """
    import pandas as pd  # noqa: F401

    schema = f"{id_col} long, payload binary, resized boolean"

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, payloads, flags = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(payload)
                hdr = parse_image_header(buf)
                ok = hdr is not None and hdr["format"] == "png"
                if ok:
                    try:
                        meta, pix = decode_png(buf)
                    except (NotImplementedError, ValueError, zlib.error, IndexError):
                        ok = False
                ids.append(rid)
                if not ok:
                    payloads.append(buf)
                    flags.append(False)
                    continue
                w, h, ch = meta["width"], meta["height"], meta["channels"]
                grid = pix.reshape(h, w, ch)[:, :, 0]
                big = np.kron(grid, np.ones((factor, factor), dtype=grid.dtype))
                payloads.append(
                    encode_png(w * factor, h * factor, big.tobytes(), channels=1)
                )
                flags.append(True)
            yield pd.DataFrame(
                {id_col: ids, "payload": payloads, "resized": flags}
            )

    from pedsnetdcc_spark.util import ensure_parallelism

    return ensure_parallelism(df.select(id_col, payload_col)).mapInPandas(
        op, schema=schema
    )


def png_dhash_pipeline(
    df: DataFrame,
    id_col: str,
    src_col: str,
    variant_mod: int | None = None,
    variant_offset: int = 10_000_000,
    variant_factor: int = 2,
) -> DataFrame:
    """Fused text → PNG → dHash pass: :func:`with_png_payload` +
    (optionally) :func:`upscale_images` + :func:`image_dhash` in ONE
    Arrow-batched ``mapInPandas``, so the MB-scale PNG payloads never
    cross the JVM↔Python boundary — only the 8-byte hash does (the
    optimization-guide §8 proxy rule: ship metadata, not payloads).

    The composed three-operator pipeline pays the payload boundary
    crossing three times AND re-runs the encode pass once per DAG
    branch (a filter on a ``mapInPandas`` output cannot push below the
    opaque operator, so ``union(imgs, upscale(imgs.where(...)))``
    executes the encode twice).  This pass does the identical codec
    work — encode, decode, 9×8 resample, 64 gradient bits; variants
    really are decoded, ``np.kron``-upscaled and RE-ENCODED before
    being re-decoded for their hash — once per row, in the worker.
    Output is row-identical to the composed pipeline (equivalence
    unit-tested).

    With ``variant_mod=m``, every row whose id ≡ 0 (mod m) also emits
    an upscaled-variant row under ``id + variant_offset``, matching
    the near-dup harness plant.

    Returns ``(id, dhash, decodable)``.
    """
    import pandas as pd  # noqa: F401

    schema = f"{id_col} long, dhash long, decodable boolean"

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, hashes, flags = [], [], []
            for rid, text in zip(pdf[id_col], pdf[src_col]):
                data = str(text).encode("utf-8")
                width = 1 + len(data) % 61
                height = max(1, -(-len(data) // width))
                padded = data.ljust(width * height, b"\x00")
                png = encode_png(width, height, padded, channels=1)
                val, ok = _png_dhash64(png)
                ids.append(rid)
                hashes.append(val)
                flags.append(ok)
                if variant_mod and rid % variant_mod == 0:
                    ids.append(rid + variant_offset)
                    try:
                        meta, pix = decode_png(png)
                        w, h, ch = (
                            meta["width"], meta["height"], meta["channels"],
                        )
                        grid = pix.reshape(h, w, ch)[:, :, 0]
                        big = np.kron(
                            grid,
                            np.ones(
                                (variant_factor, variant_factor),
                                dtype=grid.dtype,
                            ),
                        )
                        vpng = encode_png(
                            w * variant_factor,
                            h * variant_factor,
                            big.tobytes(),
                            channels=1,
                        )
                        vval, vok = _png_dhash64(vpng)
                    except (NotImplementedError, ValueError, zlib.error,
                            IndexError):
                        # an undecodable original passes through the
                        # upscale unchanged in the composed pipeline and
                        # then fails the hash decode — same terminal row
                        vval, vok = None, False
                    hashes.append(vval)
                    flags.append(vok)
            yield pd.DataFrame(
                {id_col: ids, "dhash": hashes, "decodable": flags}
            )

    from pedsnetdcc_spark.util import ensure_parallelism

    return ensure_parallelism(df.select(id_col, src_col)).mapInPandas(
        op, schema=schema
    )


def image_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    max_hamming: int = 6,
    num_bands: int | None = None,
) -> DataFrame:
    """Image near-duplicate pairs: dHash signatures joined by the
    pigeonhole-complete block-and-band Hamming join the SimHash family
    already proves (``dedup.simhash_band_pairs`` — EXACT for the given
    ``max_hamming``, no recall loss).  Undecodable images are excluded
    (they have no signature).  Returns ``(id_a, id_b, hamming)``.

    Scale shape: one codec pass for signatures (5.6 s for 550k images
    at local[32] — linear, embarrassingly parallel), then the banded
    join in MULTI-INDEX-HASHING mode (``probe_radius=1``: half as many
    bands, twice as wide, one side probed with the 1-bit-flip
    neighborhood — same exact pair set as plain banding, both
    pigeonhole-complete and equality-tested).  Image corpora are
    near-dup DENSE (the 550k probe corpus holds 203M true pairs at
    Hamming ≤ 6), which is exactly the regime where MIH wins (150 →
    123 s: fewer bands ⇒ lower per-pair multiplicity into the
    distinct); see simhash_band_pairs for the measured mode trade.
    Cost at this density is OUTPUT-bound — a consumer should feed the
    pairs straight into clusters/survivor selection rather than
    materializing them.
    """
    from pedsnetdcc_spark.datapipe.dedup import simhash_band_pairs

    sigs = (
        image_dhash(df, id_col, payload_col)
        .where(F.col("decodable"))
        .select(id_col, "dhash")
    )
    return simhash_band_pairs(
        sigs, id_col, sig_col="dhash",
        max_hamming=max_hamming, num_bands=num_bands, probe_radius=1,
    )


def audio_fingerprint(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    out_col: str = "afp",
    frames: int = 65,
) -> DataFrame:
    """Perceptual audio fingerprint — the WAV twin of
    :func:`image_dhash`: decode → channel 0 → assign sample ``i`` of
    ``n`` to frame ``(i·frames)//n`` → exact integer frame ENERGIES
    (sum of squared centered samples; integer-valued float64 sums are
    exact below 2⁵³, so the numbers are engine-portable) → ``frames−1``
    sign-of-delta bits (``E[f+1] > E[f]``) packed into a signed 64-bit
    long.  A re-encoded exact copy fingerprints identically; locally
    corrupted audio moves only the bits of the frames it touches, so
    Hamming distance tracks edit locality.  Undecodable rows keep
    their row with ``decodable = false`` and a NULL fingerprint.

    Returns ``(id, afp, decodable)``.  One Arrow-batched pass.
    """
    import pandas as pd  # noqa: F401

    if frames > 65:
        raise ValueError(f"frames-1 bits must fit a long, got frames={frames}")
    schema = f"{id_col} long, {out_col} long, decodable boolean"

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        weights = np.uint64(1) << np.arange(frames - 1, dtype=np.uint64)

        for pdf in batches:
            ids, fps, flags = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(rid)
                try:
                    meta = decode_wav(bytes(payload))
                except (ValueError, NotImplementedError, struct.error):
                    fps.append(None)
                    flags.append(False)
                    continue
                s = meta["samples"][:: max(meta["channels"], 1)]
                v = s.astype(np.float64)
                if meta["bit_depth"] == 8:
                    v = v - 128.0  # uint8 PCM is offset-binary
                n = max(len(v), 1)
                f_ids = (np.arange(len(v)) * frames) // n
                E = np.bincount(f_ids, weights=v * v, minlength=frames)
                bits = E[1:] > E[:-1]
                val = int((bits.astype(np.uint64) * weights).sum())
                if val >= 1 << 63:
                    val -= 1 << 64
                fps.append(val)
                flags.append(True)
            yield pd.DataFrame({id_col: ids, out_col: fps, "decodable": flags})

    from pedsnetdcc_spark.util import ensure_parallelism

    return ensure_parallelism(df.select(id_col, payload_col)).mapInPandas(
        op, schema=schema
    )


def wav_signal_pipeline(
    df: DataFrame,
    id_col: str,
    src_col: str,
    frames: int = 65,
) -> DataFrame:
    """Fused text → WAV → fingerprint + features pass:
    :func:`with_wav_payload` + :func:`audio_fingerprint` +
    :func:`extract_audio_features` in ONE Arrow-batched
    ``mapInPandas`` — the WAV payload never crosses the JVM↔Python
    boundary, and the encode pass runs once instead of once per DAG
    branch (the composed pipeline re-encodes per consumer because a
    ``mapInPandas`` is opaque to subtree reuse).  The codec work per
    row is identical: encode_wav, decode_wav, integer frame energies,
    sign-of-delta bits, and the numpy feature folds (equivalence
    unit-tested against the composed operators).

    ``rms`` is deliberately not emitted: its numpy pairwise summation
    is not bit-portable (the reason `audio_features` drops it), so no
    consumer of the fused pass exists for it.

    Returns ``(id, afp, decodable, channels, sample_rate, bit_depth,
    n_samples, zero_crossings, peak)``.
    """
    import pandas as pd  # noqa: F401

    if frames > 65:
        raise ValueError(f"frames-1 bits must fit a long, got frames={frames}")
    schema = (
        f"{id_col} long, afp long, decodable boolean, channels int,"
        " sample_rate int, bit_depth int, n_samples long,"
        " zero_crossings long, peak int"
    )

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        weights = np.uint64(1) << np.arange(frames - 1, dtype=np.uint64)
        cols = [
            id_col, "afp", "decodable", "channels", "sample_rate",
            "bit_depth", "n_samples", "zero_crossings", "peak",
        ]

        for pdf in batches:
            rows = []
            for rid, text in zip(pdf[id_col], pdf[src_col]):
                data = str(text).encode("utf-8") or b"\x00"
                wav = encode_wav(data, sample_rate=8000, channels=1, bits=8)
                try:
                    meta = decode_wav(wav)
                except (ValueError, NotImplementedError, struct.error):
                    rows.append(
                        (rid, None, False, None, None, None, None, None, None)
                    )
                    continue
                # fingerprint: channel-0 stream (audio_fingerprint body)
                s = meta["samples"][:: max(meta["channels"], 1)]
                v = s.astype(np.float64)
                if meta["bit_depth"] == 8:
                    v = v - 128.0  # uint8 PCM is offset-binary
                n = max(len(v), 1)
                f_ids = (np.arange(len(v)) * frames) // n
                E = np.bincount(f_ids, weights=v * v, minlength=frames)
                bits = E[1:] > E[:-1]
                val = int((bits.astype(np.uint64) * weights).sum())
                if val >= 1 << 63:
                    val -= 1 << 64
                # features: all-channel stream (extract_audio_features body)
                sa = meta["samples"].astype(np.float64)
                if meta["bit_depth"] == 8:
                    sa = sa - 128.0
                rows.append(
                    (
                        rid,
                        val,
                        True,
                        meta["channels"],
                        meta["sample_rate"],
                        meta["bit_depth"],
                        meta["n_samples"],
                        int(np.count_nonzero(np.diff(np.signbit(sa)))),
                        int(np.max(np.abs(sa))) if len(sa) else 0,
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    from pedsnetdcc_spark.util import ensure_parallelism

    return ensure_parallelism(df.select(id_col, src_col)).mapInPandas(
        op, schema=schema
    )


def audio_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    max_hamming: int = 6,
    num_bands: int | None = None,
) -> DataFrame:
    """Audio near-duplicate pairs: :func:`audio_fingerprint` signatures
    through the same pigeonhole-complete Hamming band join as
    :func:`image_near_dup_pairs` (MIH mode — media corpora are
    near-dup dense, the regime where probing wins; see
    dedup.simhash_band_pairs).  Returns ``(id_a, id_b, hamming)``."""
    from pedsnetdcc_spark.datapipe.dedup import simhash_band_pairs

    sigs = (
        audio_fingerprint(df, id_col, payload_col)
        .where(F.col("decodable"))
        .select(id_col, "afp")
    )
    return simhash_band_pairs(
        sigs, id_col, sig_col="afp",
        max_hamming=max_hamming, num_bands=num_bands, probe_radius=1,
    )
