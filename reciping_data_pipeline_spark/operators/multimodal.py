"""Multimodal (image/audio/video) column operators.

Treats media as opaque ``binary`` columns with typed metadata structs,
processed by Arrow-batched ``mapInPandas`` kernels — the pattern a
100 TB training-data pipeline needs: bytes never leave the executor,
Python sees them as zero-copy Arrow buffers in bounded batches, and
every kernel is a per-partition map (no shuffle).

Codec status: the WAV path is a REAL codec (stdlib ``wave`` —
``synthesize_wav``/``decode_wav`` round-trip genuine RIFF PCM16 bytes
and every decoded feature is oracle-matched), and since r07 so is the
PNG path (stdlib ``zlib``/``struct`` — ``synth_png_bytes`` emits
spec-compliant chunks with CRCs and all five scanline filters;
``decode_png_bytes`` verifies CRCs, inflates, reconstructs filters,
and :func:`decode_image` uses it for any PNG-signatured bytes).
JPEG/video codecs remain STUBBED: Pillow/opencv are not in this
container, so those paths raise ``NotImplementedError`` unless
``fake=True``, which substitutes a deterministic fake decoder
(dimensions/features derived from the bytes themselves). The Spark
plumbing — schema, batch iteration, column pruning, partition
parallelism — is identical for real and stub kernels; WAV and PNG
prove the pattern carries true decoders unchanged.

Design notes at scale:
- metadata (lengths, hashes, formats) is computed JVM-side with
  built-in functions where possible; Python kernels only run where
  bytes must be interpreted;
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds kernel
  memory: batch_bytes ≈ records x media_size, so media tables should
  set it low (e.g. 64) — documented here rather than hard-coded so
  callers tune per media size;
- frame sampling/resize emit MULTIPLE rows per input via the iterator
  contract (a generator per batch), never materializing a whole
  partition's frames at once.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType(), True),  # image | audio | video
        StructField("format", StringType(), True),  # png | jpg | wav | mp4 ...
        StructField("byte_len", LongType(), True),
        StructField("sha256", StringType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("mean_luma", StringType(), True),  # kept string: deterministic repr
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("frame_idx", IntegerType(), True),
        StructField("frame_bytes", BinaryType(), True),
    ]
)


def attach_media_meta(df: DataFrame, bytes_col: str, media_type: str, fmt: str) -> DataFrame:
    """Typed metadata computed JVM-side (no Python): length + sha256."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.length(F.col(bytes_col)).cast("long").alias("byte_len"),
            F.sha2(F.col(bytes_col), 256).alias("sha256"),
        ),
    )


def _fake_decode(data: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in for a real image decoder: dimensions and
    mean luma derived from a content hash. Replace with Pillow:
    ``img = Image.open(io.BytesIO(data)); img.size, ...``."""
    h = hashlib.sha256(data).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 3
    mean_luma = round(sum(h[2:10]) / 8 / 255.0, 4)
    return width, height, channels, mean_luma


def decode_image(df: DataFrame, id_col: str, bytes_col: str, *, fake: bool = False) -> DataFrame:
    """Decode image bytes → (width, height, channels, mean_luma).

    PNG decodes FOR REAL (stdlib :func:`decode_png_bytes` — CRC walk,
    inflate, filter reconstruction; mean_luma = mean sample / 255 at 4
    decimals). Other formats (JPEG etc.) need a codec library not in
    this container and raise NotImplementedError inside the kernel.
    ``fake=True`` forces the deterministic stub for every row
    regardless of format (plumbing tests with arbitrary bytes).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[bytes_col]):
                data = bytes(b)
                if fake:
                    w, h, ch, luma = _fake_decode(data)
                elif data[:8] == PNG_SIG:
                    w, h, ch, _depth, psum = decode_png_bytes(data)
                    luma = round(psum / (w * h * ch) / 255.0, 4)
                else:
                    raise NotImplementedError(
                        "real decode implemented for PNG only; other formats "
                        "need Pillow/opencv (pass fake=True for the stub)"
                    )
                rows.append((int(i), w, h, ch, f"{luma:.4f}"))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "n_channels", "mean_luma"]
            )

    # Column pruning before the Python exchange: only (id, bytes) cross
    # the Arrow boundary, not the whole row.
    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame, id_col: str, bytes_col: str, *, every_n: int = 10, max_frames: int = 8
) -> DataFrame:
    """Video → sampled frame rows (1:N via the mapInPandas generator
    contract). The frame extraction itself is the deterministic stub:
    byte-range slices standing in for decoded frames; a real ffmpeg/
    pyav kernel keeps the identical signature and schema."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[bytes_col]):
                data = bytes(b)
                n = min(max_frames, max(1, len(data) // max(every_n, 1)))
                step = max(1, len(data) // max(n, 1))
                for k in range(n):
                    rows.append((int(i), k, data[k * step : k * step + step]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"])

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(kernel, FRAME_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("resized_bytes", BinaryType(), True),
    ]
)

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("rms", StringType(), True),  # deterministic repr
    ]
)


def resize_image(
    df: DataFrame, id_col: str, bytes_col: str, *, width: int = 224, height: int = 224,
    fake: bool = False,
) -> DataFrame:
    """Resize image bytes to (width, height) — the training-data
    normalization step before feature extraction. Stub codec: output
    bytes are a deterministic content-derived slice sized
    ``width*height*3 // 64`` (bounded stand-in for the real buffer); a
    Pillow kernel (``img.resize((w, h))``) keeps the identical
    signature, schema, and batch shape."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = max(1, width * height * 3 // 64)
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image resize needs Pillow/opencv; pass fake=True for the stub"
                )
            rows = []
            for i, b in zip(pdf[id_col], pdf[bytes_col]):
                data = bytes(b)
                reps = target // max(len(data), 1) + 1
                rows.append((int(i), width, height, (data * reps)[:target]))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "resized_bytes"])

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(kernel, RESIZED_SCHEMA)


def extract_audio_features(
    df: DataFrame, id_col: str, bytes_col: str, *, sample_rate: int = 16_000,
    fake: bool = False,
) -> DataFrame:
    """Audio bytes → (duration_ms, sample_rate, rms). Stub codec:
    duration from byte length at 2 bytes/sample mono PCM, rms from a
    content hash; a librosa/soundfile kernel keeps the identical
    signature and schema."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real audio decode needs librosa/soundfile; pass fake=True for the stub"
                )
            rows = []
            for i, b in zip(pdf[id_col], pdf[bytes_col]):
                data = bytes(b)
                n_samples = len(data) // 2
                duration_ms = n_samples * 1000 // sample_rate
                h = hashlib.sha256(data).digest()
                rms = round(sum(h[:8]) / 8 / 255.0, 4)
                rows.append((int(i), duration_ms, sample_rate, f"{rms:.4f}"))
            yield pd.DataFrame(rows, columns=["doc_id", "duration_ms", "sample_rate", "rms"])

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)


WAV_FEATURES_SCHEMA = (
    "doc_id long, n_channels int, sample_rate int, n_frames long, "
    "duration_ms long, rms_int long"
)


def synth_wav_bytes(amp: int, n_frames: int, sample_rate: int = 16_000) -> bytes:
    """REAL RIFF/WAVE PCM16 mono bytes (stdlib ``wave``): a square wave
    alternating ±``amp`` for ``n_frames`` frames. Pure function —
    property-tested directly, wrapped by the Arrow kernel below."""
    import io
    import wave as wave_mod

    import numpy as np

    pcm = np.where(np.arange(n_frames) % 2 == 0, amp, -amp).astype("<i2")
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav_bytes(data: bytes) -> tuple[int, int, int, int, int]:
    """REAL audio decode (not a stub): parse RIFF/WAVE headers and PCM16
    frames with stdlib ``wave``; exact integer RMS via numpy. Returns
    (n_channels, sample_rate, n_frames, duration_ms, rms_int)."""
    import io
    import wave as wave_mod

    import numpy as np

    with wave_mod.open(io.BytesIO(data), "rb") as w:
        nch = w.getnchannels()
        sr = w.getframerate()
        nf = w.getnframes()
        pcm = np.frombuffer(w.readframes(nf), dtype="<i2").astype(np.float64)
    rms = float(np.sqrt(np.mean(pcm**2))) if len(pcm) else 0.0
    return nch, sr, nf, nf * 1000 // sr, int(round(rms))


def synthesize_wav(
    df: DataFrame,
    id_col: str,
    amp_col: str,
    frames_col: str,
    *,
    sample_rate: int = 16_000,
) -> DataFrame:
    """Per-row :func:`synth_wav_bytes` as an Arrow kernel. Deterministic
    pure function of its inputs, so any engine can predict the decoded
    features exactly; a square wave's RMS is its amplitude, keeping the
    round-trip oracle integer-exact."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(i), synth_wav_bytes(int(amp), int(n), sample_rate))
                for i, amp, n in zip(pdf[id_col], pdf[amp_col], pdf[frames_col])
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "wav_bytes"])

    return df.select(F.col(id_col), F.col(amp_col), F.col(frames_col)).mapInPandas(
        kernel, "doc_id long, wav_bytes binary"
    )


PNG_SIG = b"\x89PNG\r\n\x1a\n"

PNG_FEATURES_SCHEMA = (
    "doc_id long, width int, height int, n_channels int, bit_depth int, "
    "pixel_sum long"
)


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def synth_png_bytes(doc_id: int, width: int, height: int) -> bytes:
    """REAL PNG encoder (stdlib zlib/struct, no Pillow): 8-bit RGB,
    spec-compliant chunks with CRCs, one zlib IDAT. Pixel (x, y) is the
    deterministic gradient (r, g, b) = ((doc_id+x)%256, (doc_id+y)%256,
    (x+y)%256) so decoded stats have a closed form any engine can
    compute, and the row filter type cycles y % 5 through ALL five PNG
    filters (None/Sub/Up/Average/Paeth) — every image taller than 4
    rows exercises the decoder's full filter reconstruction."""
    import struct
    import zlib

    bpp = 3
    stream = bytearray()
    prior = bytes(width * bpp)
    for y in range(height):
        raw = bytes(
            v
            for x in range(width)
            for v in ((doc_id + x) % 256, (doc_id + y) % 256, (x + y) % 256)
        )
        f = y % 5
        stream.append(f)
        if f == 0:
            filt = raw
        elif f == 1:  # Sub
            filt = bytes(
                (raw[i] - (raw[i - bpp] if i >= bpp else 0)) % 256
                for i in range(len(raw))
            )
        elif f == 2:  # Up
            filt = bytes((raw[i] - prior[i]) % 256 for i in range(len(raw)))
        elif f == 3:  # Average
            filt = bytes(
                (raw[i] - (((raw[i - bpp] if i >= bpp else 0) + prior[i]) >> 1)) % 256
                for i in range(len(raw))
            )
        else:  # Paeth
            filt = bytes(
                (
                    raw[i]
                    - _paeth(
                        raw[i - bpp] if i >= bpp else 0,
                        prior[i],
                        prior[i - bpp] if i >= bpp else 0,
                    )
                )
                % 256
                for i in range(len(raw))
            )
        stream += filt
        prior = raw
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(stream)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_bytes(data: bytes) -> tuple[int, int, int, int, int]:
    """REAL PNG decoder (stdlib, no Pillow): chunk walk with CRC
    verification, zlib inflate, and full scanline filter reconstruction
    (None/Sub/Up/Average/Paeth). Supports non-interlaced 8-bit
    grayscale/RGB/RGBA — the training-data common case; anything else
    raises rather than guessing. Returns (width, height, n_channels,
    bit_depth, pixel_sum) where pixel_sum is the exact integer sum of
    every reconstructed sample — the feature the round-trip oracle
    checks bit-for-bit."""
    import struct
    import zlib

    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = bit_depth = color_type = None
    idat = bytearray()
    while pos + 12 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r}: CRC mismatch")
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if bit_depth != 8 or color_type not in (0, 2, 6) or interlace:
                raise NotImplementedError(
                    f"PNG bit_depth={bit_depth} color_type={color_type} "
                    f"interlace={interlace} unsupported (8-bit G/RGB/RGBA only)"
                )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if width is None:
        raise ValueError("PNG: missing IHDR")
    channels = {0: 1, 2: 3, 6: 4}[color_type]
    bpp = channels
    stream = zlib.decompress(bytes(idat))
    stride = width * bpp
    prior = bytes(stride)
    pixel_sum = 0
    p = 0
    for _y in range(height):
        f = stream[p]
        p += 1
        row = bytearray(stream[p : p + stride])
        p += stride
        if f == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) % 256
        elif f == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prior[i]) % 256
        elif f == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prior[i]) >> 1)) % 256
        elif f == 4:  # Paeth
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                ul = prior[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + _paeth(left, prior[i], ul)) % 256
        elif f != 0:
            raise ValueError(f"PNG: unknown filter type {f}")
        prior = bytes(row)
        pixel_sum += sum(row)
    return width, height, channels, bit_depth, pixel_sum


def synthesize_png(df: DataFrame, id_col: str, w_col: str, h_col: str) -> DataFrame:
    """Per-row :func:`synth_png_bytes` as an Arrow kernel — genuine
    spec-compliant PNG bytes, deterministic per (id, w, h)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(i), synth_png_bytes(int(i), int(w), int(h)))
                for i, w, h in zip(pdf[id_col], pdf[w_col], pdf[h_col])
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "png_bytes"])

    return df.select(F.col(id_col), F.col(w_col), F.col(h_col)).mapInPandas(
        kernel, "doc_id long, png_bytes binary"
    )


def decode_png(df: DataFrame, id_col: str, bytes_col: str) -> DataFrame:
    """Per-row :func:`decode_png_bytes` as an Arrow kernel — the image
    sibling of :func:`decode_wav`: a true decoder (CRC check, inflate,
    filter reconstruction) riding the same mapInPandas plumbing the
    stub codecs use."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(i), *decode_png_bytes(bytes(b)))
                for i, b in zip(pdf[id_col], pdf[bytes_col])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_channels", "bit_depth",
                    "pixel_sum",
                ],
            )

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(kernel, PNG_FEATURES_SCHEMA)


def decode_wav(df: DataFrame, id_col: str, bytes_col: str) -> DataFrame:
    """Per-row :func:`decode_wav_bytes` as an Arrow kernel — the same
    mapInPandas shape as the stubbed codecs; proof that the plumbing
    carries a genuine decoder unchanged."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(i), *decode_wav_bytes(bytes(b)))
                for i, b in zip(pdf[id_col], pdf[bytes_col])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_channels", "sample_rate", "n_frames",
                    "duration_ms", "rms_int",
                ],
            )

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(kernel, WAV_FEATURES_SCHEMA)
