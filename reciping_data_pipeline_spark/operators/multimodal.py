"""Multimodal (image/audio/video) column operators.

Treats media as opaque ``binary`` columns with typed metadata structs,
processed by Arrow-batched ``mapInPandas`` kernels — the pattern a
100 TB training-data pipeline needs: bytes never leave the executor,
Python sees them as zero-copy Arrow buffers in bounded batches, and
every kernel is a per-partition map (no shuffle).

Codec status: FOUR real codecs, zero codec libraries. WAV (stdlib
``wave`` — genuine RIFF PCM16, every decoded feature oracle-matched),
PNG (stdlib ``zlib``/``struct`` — spec-compliant chunks with verified
CRCs, all five scanline filters reconstructed), baseline JPEG
(stdlib+numpy — full JFIF marker stream, float DCT, zigzag,
DC-differential + AC run-length Huffman with byte stuffing; the
decoder reads any baseline sequential 8-bit stream without subsampling
via its embedded tables), and animated GIF89a (stdlib — real
variable-width LZW with clear/end codes and sub-block framing; the
MULTI-FRAME container, so frame sampling runs on actually-decoded
frames and the sampling policy is a relational filter downstream of
the codec), plus a real AVI/MJPEG VIDEO container (RIFF mux/demux
whose frame payloads run through the baseline-JPEG codec —
:func:`decode_video_frames` does genuine per-frame video decode).
:func:`decode_image` routes PNG- and JPEG-signatured bytes through
the real decoders; :func:`decode_gif_frames` /
:func:`decode_video_frames` are the real siblings of the byte-slice
``sample_frames`` stub. Only non-MJPEG video compression (h264 etc.)
and exotic image formats remain STUBBED (no ffmpeg/Pillow in this
container): those paths raise ``NotImplementedError`` unless
``fake=True``. The Spark plumbing — schema, batch iteration, column
pruning, partition parallelism — is identical for real and stub
kernels.

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

    PNG and baseline JPEG decode FOR REAL (stdlib
    :func:`decode_png_bytes` / :func:`decode_jpeg_bytes`; mean_luma =
    mean sample / 255 at 4 decimals). Other formats need a codec
    library not in this container and raise NotImplementedError inside
    the kernel. ``fake=True`` forces the deterministic stub for every
    row regardless of format (plumbing tests with arbitrary bytes).
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
                elif data[:2] == b"\xff\xd8":
                    w, h, ch, psum = decode_jpeg_bytes(data)
                    luma = round(psum / (w * h * ch) / 255.0, 4)
                else:
                    raise NotImplementedError(
                        "real decode implemented for PNG and baseline JPEG only; "
                        "other formats need Pillow/opencv (pass fake=True for the stub)"
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


# --------------------------------------------------------------------------
# GIF89a codec — stdlib only. Real LZW compression/decompression (variable
# code width, clear/end codes, LSB-first packing, 255-byte sub-blocks), a
# global color table, and one image descriptor per frame: a genuine
# MULTI-FRAME container, so frame sampling runs on actually-decoded frames
# instead of byte-slice stubs. Lossless, hence integer-exact round trips.

GIF_PALETTE_BITS = 6  # 64-entry global color table
GIF_PALETTE_SIZE = 1 << GIF_PALETTE_BITS


def _gif_palette() -> list[tuple[int, int, int]]:
    return [((i * 3) % 256, (i * 5) % 256, (i * 7) % 256) for i in range(GIF_PALETTE_SIZE)]


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # LSB-first
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear, width)
    seq: tuple = ()
    for idx in indices:
        cand = seq + (idx,)
        if cand in table:
            seq = cand
            continue
        put(table[seq], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code >= (1 << 12):
            put(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        seq = (idx,)
    if seq:
        put(table[seq], width)
    put(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    clear = 1 << min_code_size
    end = clear + 1
    pos = 0

    def get(w: int) -> int:
        nonlocal pos
        v = 0
        for i in range(w):
            byte = data[(pos + i) >> 3]
            v |= ((byte >> ((pos + i) & 7)) & 1) << i
        pos += w
        return v

    table: list[tuple] = [(i,) for i in range(clear)] + [(), ()]
    width = min_code_size + 1
    out: list[int] = []
    prev: tuple | None = None
    total_bits = len(data) * 8
    while pos + width <= total_bits:
        code = get(width)
        if code == clear:
            table = [(i,) for i in range(clear)] + [(), ()]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table) and table[code]:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + (prev[0],)  # the cScSc special case
        else:
            raise ValueError(f"GIF LZW: invalid code {code}")
        out.extend(entry)
        if prev is not None:
            table.append(prev + (entry[0],))
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def synth_gif_bytes(doc_id: int, width: int, height: int, n_frames: int) -> bytes:
    """REAL animated-GIF89a encoder (stdlib only): ``n_frames`` frames
    of the deterministic pattern index(x, y, f) = (doc_id + f + x + y)
    mod 64 over a fixed 64-entry palette, LZW-compressed per frame with
    a graphics-control extension each. Lossless — decode recovers every
    index exactly, so all frame features are closed-form."""
    import struct

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | (GIF_PALETTE_BITS - 1) << 4 | (GIF_PALETTE_BITS - 1), 0, 0])
    for r, g, b in _gif_palette():
        out += bytes((r, g, b))
    for f in range(n_frames):
        out += b"\x21\xf9\x04\x00\x0a\x00\x00\x00"  # GCE: 10 cs delay
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        indices = [
            (doc_id + f + x + y) % GIF_PALETTE_SIZE
            for y in range(height)
            for x in range(width)
        ]
        out.append(GIF_PALETTE_BITS)  # LZW min code size
        payload = _lzw_encode(indices, GIF_PALETTE_BITS)
        for lo in range(0, len(payload), 255):
            chunk = payload[lo : lo + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # block terminator
    out += b"\x3b"  # trailer
    return bytes(out)


def decode_gif_frames_bytes(data: bytes) -> list[tuple[int, int, int, int]]:
    """REAL GIF decoder (stdlib only): header + logical screen + global
    color table, extension skipping, per-frame image descriptors
    (local color tables honored), LZW decompression. Returns one tuple
    per frame: (frame_idx, width, height, rgb_sum) where rgb_sum is
    the exact integer sum of every decoded pixel's palette RGB.
    Interlaced frames raise (scope: non-interlaced baseline GIFs)."""
    import struct

    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    sw, sh = struct.unpack("<HH", data[6:10])
    flags = data[10]
    pos = 13
    gct: list[tuple[int, int, int]] = []
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = [tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
        pos += 3 * n
    frames: list[tuple[int, int, int, int]] = []
    saw_trailer = False
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x3B:  # trailer
            saw_trailer = True
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{b0:02X}")
        _left, _top, w, h = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
        iflags = data[pos + 9]
        pos += 10
        if iflags & 0x40:
            raise NotImplementedError("interlaced GIF frames unsupported")
        palette = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            palette = [tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
            pos += 3 * n
        mcs = data[pos]
        pos += 1
        payload = bytearray()
        while data[pos]:
            ln = data[pos]
            payload += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        indices = _lzw_decode(bytes(payload), mcs)
        if len(indices) < w * h:
            raise ValueError(f"GIF: frame under-decoded ({len(indices)} < {w * h})")
        rgb_sum = sum(sum(palette[i]) for i in indices[: w * h])
        frames.append((len(frames), w, h, rgb_sum))
    if not saw_trailer:
        raise ValueError("GIF: truncated stream (missing trailer)")
    return frames


def decode_gif_frames(df: DataFrame, id_col: str, bytes_col: str) -> DataFrame:
    """Per-row :func:`decode_gif_frames_bytes` as a 1:N Arrow kernel —
    REAL multi-frame extraction on the same generator contract the
    stub ``sample_frames`` uses; downstream sampling (every-nth frame,
    frame caps) is then a relational filter, not codec logic."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[bytes_col]):
                for frame_idx, w, h, rgb_sum in decode_gif_frames_bytes(bytes(b)):
                    rows.append((int(i), frame_idx, w, h, rgb_sum))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "width", "height", "rgb_sum"]
            )

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(
        kernel, "doc_id long, frame_idx int, width int, height int, rgb_sum long"
    )


def synthesize_gif(
    df: DataFrame, id_col: str, w_col: str, h_col: str, frames_col: str
) -> DataFrame:
    """Per-row :func:`synth_gif_bytes` as an Arrow kernel."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(i), synth_gif_bytes(int(i), int(w), int(h), int(nf)))
                for i, w, h, nf in zip(
                    pdf[id_col], pdf[w_col], pdf[h_col], pdf[frames_col]
                )
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "gif_bytes"])

    return df.select(F.col(id_col), F.col(w_col), F.col(h_col), F.col(frames_col)).mapInPandas(
        kernel, "doc_id long, gif_bytes binary"
    )


# --------------------------------------------------------------------------
# AVI/MJPEG video — stdlib only. A real RIFF container mux/demux whose frame
# payloads are genuine baseline JPEGs (the codec above): actual VIDEO frame
# decode, not a byte-slice stub. Scope: 'vids'/'MJPG' single-stream AVIs,
# '00dc'/'00db' movi chunks, even-byte chunk padding.


def _riff_chunk(tag: bytes, payload: bytes) -> bytes:
    import struct

    pad = b"\x00" if len(payload) % 2 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def synth_avi_mjpeg_bytes(doc_id: int, width: int, height: int, n_frames: int) -> bytes:
    """REAL AVI (RIFF) muxer (stdlib only): ``n_frames`` MJPEG frames,
    each a spec-complete baseline JPEG of the solid color derived from
    (doc_id + frame). Emits hdrl (avih + strl/strh/strf) and the movi
    LIST with even-padded '00dc' chunks — a stream any AVI demuxer
    walks. Solid frames are integer-exact through the JPEG chain, so
    every decoded frame feature is closed-form."""
    import struct

    if n_frames < 1:
        raise ValueError(
            f"synth_avi_mjpeg_bytes requires n_frames >= 1, got {n_frames}: "
            "an AVI with zero frames has no max-chunk size for the avih "
            "header (and no demuxer-visible stream)"
        )
    frames = []
    for f in range(n_frames):
        c = doc_id + f
        frames.append(synth_jpeg_bytes(c % 256, (c * 7) % 256, (c * 13) % 256, width, height))
    avih = struct.pack(
        "<14I", 40_000, 0, 0, 0x10, n_frames, 0, 1, max(len(j) for j in frames),
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<10I", 0, 0, 0, 1, 25, 0, n_frames, 0, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack("<I2i2H", 40, width, height, 1, 24) + b"MJPG" + struct.pack(
        "<Iii2I", width * height * 3, 0, 0, 0, 0
    )
    strl = _riff_chunk(b"LIST", b"strl" + _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf))
    hdrl = _riff_chunk(b"LIST", b"hdrl" + _riff_chunk(b"avih", avih) + strl)
    movi = _riff_chunk(b"LIST", b"movi" + b"".join(_riff_chunk(b"00dc", j) for j in frames))
    return _riff_chunk(b"RIFF", b"AVI " + hdrl + movi)


def decode_avi_frames_bytes(data: bytes) -> list[tuple[int, int, int, int]]:
    """REAL AVI demuxer + MJPEG frame decode (stdlib only): validates
    the RIFF/'AVI ' envelope, walks LIST chunks to 'movi', and decodes
    every '00dc'/'00db' payload with the baseline JPEG decoder.
    Returns one tuple per frame: (frame_idx, width, height, pixel_sum).
    Non-MJPEG payloads fail inside the JPEG decoder (bad SOI) rather
    than decoding garbage."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF signature")
    (riff_len,) = struct.unpack("<I", data[4:8])
    end = min(len(data), 8 + riff_len)
    frames: list[tuple[int, int, int, int]] = []

    def walk(lo: int, hi: int) -> None:
        pos = lo
        while pos + 8 <= hi:
            tag = data[pos : pos + 4]
            (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_lo = pos + 8
            body_hi = body_lo + ln
            if body_hi > hi:
                raise ValueError("AVI: truncated chunk")
            if tag == b"LIST":
                list_type = data[body_lo : body_lo + 4]
                if list_type in (b"movi", b"hdrl", b"rec "):
                    walk(body_lo + 4, body_hi)
            elif tag[2:4] in (b"dc", b"db") and ln:
                w, h, _nc, psum = decode_jpeg_bytes(data[body_lo:body_hi])
                frames.append((len(frames), w, h, psum))
            pos = body_hi + (ln % 2)  # chunks pad to even byte counts
    walk(12, end)
    if not frames:
        raise ValueError("AVI: no video frame chunks found")
    return frames


def decode_video_frames(df: DataFrame, id_col: str, bytes_col: str) -> DataFrame:
    """Per-row :func:`decode_avi_frames_bytes` as a 1:N Arrow kernel —
    real video frame extraction (RIFF demux + JPEG decode per frame)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[bytes_col]):
                for frame_idx, w, h, psum in decode_avi_frames_bytes(bytes(b)):
                    rows.append((int(i), frame_idx, w, h, psum))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "width", "height", "pixel_sum"]
            )

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(
        kernel, "doc_id long, frame_idx int, width int, height int, pixel_sum long"
    )


def synthesize_video(
    df: DataFrame, id_col: str, w_col: str, h_col: str, frames_col: str
) -> DataFrame:
    """Per-row :func:`synth_avi_mjpeg_bytes` as an Arrow kernel."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(i), synth_avi_mjpeg_bytes(int(i), int(w), int(h), int(nf)))
                for i, w, h, nf in zip(
                    pdf[id_col], pdf[w_col], pdf[h_col], pdf[frames_col]
                )
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "avi_bytes"])

    return df.select(F.col(id_col), F.col(w_col), F.col(h_col), F.col(frames_col)).mapInPandas(
        kernel, "doc_id long, avi_bytes binary"
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


# --------------------------------------------------------------------------
# Baseline JPEG (JFIF) codec — stdlib only. Sequential DCT, 8-bit, 3-component
# 4:4:4 or grayscale, no subsampling/progressive/restart. The Huffman tables
# are CONSTRUCTED canonical codes (DC: 12 symbols @4 bits, AC: 176 symbols
# @8 bits) rather than the Annex-K defaults: baseline files always embed
# their tables in DHT, so any spec-compliant reader decodes them, and the
# constructed form removes every memorized-constant risk. Compression is
# suboptimal (fixed-length codes); correctness is what's exercised.

_JPEG_DC_SYMS = list(range(12))  # DC size categories 0..11
_JPEG_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11) if (r << 4) | s not in (0x00, 0xF0)
]  # EOB, ZRL, and every (run, size)


def _canonical_code(symbols: list, length: int) -> tuple[dict, list]:
    """All symbols at one code length → (symbol → (code, length), BITS list
    for DHT). Valid iff len(symbols) <= 2**length (Kraft)."""
    assert len(symbols) <= (1 << length)
    table = {sym: (i, length) for i, sym in enumerate(symbols)}
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return table, bits


_DC_CODE, _DC_BITS = _canonical_code(_JPEG_DC_SYMS, 4)
_AC_CODE, _AC_BITS = _canonical_code(_JPEG_AC_SYMS, 8)


def _dct_matrix():
    import math

    import numpy as np

    a = np.zeros((8, 8))
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return a


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.out)


def _jpeg_segment(marker: int, payload: bytes) -> bytes:
    import struct

    return struct.pack(">HH", marker, len(payload) + 2) + payload


_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _rgb_to_ycbcr(r: int, g: int, b: int) -> tuple[int, int, int]:
    """Integer YCbCr samples via floor(x + 0.5) — the exact chain the
    round-trip oracle mirrors in SQL (identical IEEE mul/add/floor)."""
    import math

    y = math.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
    cb = math.floor(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b + 0.5)
    cr = math.floor(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5)
    clamp = lambda v: max(0, min(255, v))  # noqa: E731
    return clamp(y), clamp(cb), clamp(cr)


def _ycbcr_to_rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    import math

    r = math.floor(y + 1.402 * (cr - 128) + 0.5)
    g = math.floor(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5)
    b = math.floor(y + 1.772 * (cb - 128) + 0.5)
    clamp = lambda v: max(0, min(255, v))  # noqa: E731
    return clamp(r), clamp(g), clamp(b)


def encode_jpeg_rgb(pixels, width: int, height: int) -> bytes:
    """REAL baseline JFIF encoder (stdlib + numpy): arbitrary RGB
    pixels. ``pixels`` is an (h, w, 3) uint8-like array. Full pipeline:
    YCbCr (floor(x+0.5) integer samples), edge-replicated 8×8 blocks,
    float DCT (orthonormal matrix form), all-ones quantization (round),
    zigzag, DC-differential + AC run-length Huffman entropy coding with
    byte stuffing. All-ones tables mean the only loss is coefficient
    rounding (≤ ~2 per pixel on arbitrary images; EXACTLY zero on
    constant blocks, which is what the round-trip oracle exploits).
    The stream is spec-complete: SOI, APP0/JFIF, DQT×2, SOF0, DHT×4,
    SOS, entropy-coded MCUs, EOI."""
    import struct

    import numpy as np

    pix = np.asarray(pixels, dtype=np.float64)
    assert pix.shape == (height, width, 3), pix.shape
    r, g, b = pix[..., 0], pix[..., 1], pix[..., 2]
    planes = [
        np.clip(np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5), 0, 255),
        np.clip(np.floor(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b + 0.5), 0, 255),
        np.clip(np.floor(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5), 0, 255),
    ]
    mcus_x = -(-width // 8)
    mcus_y = -(-height // 8)
    # edge replication out to the MCU grid
    pad_y, pad_x = mcus_y * 8 - height, mcus_x * 8 - width
    planes = [np.pad(p, ((0, pad_y), (0, pad_x)), mode="edge") for p in planes]

    out = bytearray(b"\xff\xd8")  # SOI
    out += _jpeg_segment(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    ones = bytes([1] * 64)
    out += _jpeg_segment(0xFFDB, b"\x00" + ones)  # DQT id 0 (luma)
    out += _jpeg_segment(0xFFDB, b"\x01" + ones)  # DQT id 1 (chroma)
    # SOF0: 8-bit, 3 components, 1x1 sampling (4:4:4)
    sof = struct.pack(">BHHB", 8, height, width, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += struct.pack(">BBB", cid, 0x11, tq)
    out += _jpeg_segment(0xFFC0, sof)
    for tc_th, (bits, syms) in (
        ((0, 0), (_DC_BITS, _JPEG_DC_SYMS)),
        ((0, 1), (_DC_BITS, _JPEG_DC_SYMS)),
        ((1, 0), (_AC_BITS, _JPEG_AC_SYMS)),
        ((1, 1), (_AC_BITS, _JPEG_AC_SYMS)),
    ):
        out += _jpeg_segment(
            0xFFC4,
            bytes([(tc_th[0] << 4) | tc_th[1]]) + bytes(bits) + bytes(syms),
        )
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += _jpeg_segment(0xFFDA, sos)

    a = _dct_matrix()
    bw = _BitWriter()
    prev_dc = [0, 0, 0]

    def put_magnitude(v: int) -> tuple[int, int]:
        mag, s = abs(v), 0
        while mag:
            s += 1
            mag >>= 1
        return s, (v if v >= 0 else v + (1 << s) - 1)

    for my in range(mcus_y):
        for mx in range(mcus_x):
            for comp in range(3):
                block = planes[comp][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] - 128.0
                coefs = np.rint(a @ block @ a.T).astype(np.int64)  # q = 1
                zz = [int(coefs.flat[_ZIGZAG[i]]) for i in range(64)]
                diff = zz[0] - prev_dc[comp]
                prev_dc[comp] = zz[0]
                s, v = put_magnitude(diff)
                code, ln = _DC_CODE[s]
                bw.put(code, ln)
                if s:
                    bw.put(v, s)
                run = 0
                last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
                for i in range(1, last_nz + 1):
                    if zz[i] == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = _AC_CODE[0xF0]  # ZRL
                        bw.put(code, ln)
                        run -= 16
                    s, v = put_magnitude(zz[i])
                    code, ln = _AC_CODE[(run << 4) | s]
                    bw.put(code, ln)
                    bw.put(v, s)
                    run = 0
                if last_nz < 63:
                    code, ln = _AC_CODE[0x00]  # EOB
                    bw.put(code, ln)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def synth_jpeg_bytes(r: int, g: int, b: int, width: int, height: int) -> bytes:
    """Solid-(r,g,b) image through the REAL encoder: constant blocks
    have one DC coefficient (8*(v-128), quantize/dequantize exact), so
    the decoded image is the deterministic YCbCr→RGB round trip of the
    input color — closed-form for the cross-engine oracle."""
    import numpy as np

    pix = np.empty((height, width, 3), dtype=np.float64)
    pix[..., 0], pix[..., 1], pix[..., 2] = r, g, b
    return encode_jpeg_rgb(pix, width, height)


def decode_jpeg_bytes(data: bytes) -> tuple[int, int, int, int]:
    """REAL baseline JPEG decoder (stdlib only): marker walk, DQT/DHT/
    SOF0/SOS parsing, Huffman + byte-stuffing entropy decode, dequant,
    float IDCT, level shift, YCbCr→RGB (floor(x+0.5), clamped).
    Decodes ANY baseline sequential 8-bit stream without subsampling
    (grayscale or 3-component 1x1) using its embedded tables;
    progressive/subsampled/restart streams raise NotImplementedError.
    Returns (width, height, n_channels, pixel_sum) with pixel_sum the
    exact integer sum of every decoded sample over the w×h image."""
    import struct

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = None
    comps: list[tuple[int, int, int]] = []  # (cid, sampling, tq)
    scan_comps: list[tuple[int, int, int]] = []  # (cid, dc_table, ac_table)
    pos = 2
    scan_start = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG: marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq:
                    raise NotImplementedError("16-bit quant tables unsupported")
                qt[tq] = list(payload[p + 1 : p + 65])
                p += 65
        elif marker == 0xC4:  # DHT — build (length, code) -> symbol maps
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                nsyms = sum(bits)
                syms = list(payload[p + 17 : p + 17 + nsyms])
                table: dict[tuple[int, int], int] = {}
                code = 0
                k = 0
                for ln in range(1, 17):
                    for _ in range(bits[ln - 1]):
                        table[(ln, code)] = syms[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(tc, th)] = table
                p += 17 + nsyms
        elif marker == 0xC0:  # SOF0 baseline
            _prec, height, width, nc = struct.unpack(">BHHB", payload[:6])
            comps = []
            for i in range(nc):
                cid, samp, tq = payload[6 + 3 * i : 9 + 3 * i]
                if samp != 0x11:
                    raise NotImplementedError("chroma subsampling unsupported")
                comps.append((cid, samp, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(f"non-baseline SOF marker 0xFF{marker:02X}")
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            scan_comps = [
                (payload[1 + 2 * i], payload[2 + 2 * i] >> 4, payload[2 + 2 * i] & 0xF)
                for i in range(ns)
            ]
            scan_start = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if width is None or scan_start is None:
        raise ValueError("JPEG: missing SOF/SOS")

    # de-stuff entropy bytes up to EOI
    bits_data = bytearray()
    p = scan_start
    while p < len(data):
        b = data[p]
        if b == 0xFF:
            nxt = data[p + 1]
            if nxt == 0x00:
                bits_data.append(0xFF)
                p += 2
                continue
            break  # EOI or another marker
        bits_data.append(b)
        p += 1

    bitpos = 0

    def read_bit() -> int:
        nonlocal bitpos
        byte = bits_data[bitpos >> 3]
        bit = (byte >> (7 - (bitpos & 7))) & 1
        bitpos += 1
        return bit

    def read_huff(table: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | read_bit()
            if (ln, code) in table:
                return table[(ln, code)]
        raise ValueError("JPEG: invalid Huffman code")

    def receive_extend(s: int) -> int:
        if s == 0:
            return 0
        v = 0
        for _ in range(s):
            v = (v << 1) | read_bit()
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    import numpy as np

    a = _dct_matrix()
    mcus_x = -(-width // 8)
    mcus_y = -(-height // 8)
    nc = len(scan_comps)
    planes = [np.zeros((mcus_y * 8, mcus_x * 8)) for _ in range(nc)]
    prev_dc = [0] * nc
    comp_tq = {cid: tq for cid, _s, tq in comps}
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (cid, dc_t, ac_t) in enumerate(scan_comps):
                q = qt[comp_tq[cid]]
                coefs = np.zeros(64)
                s = read_huff(huff[(0, dc_t)])
                prev_dc[ci] += receive_extend(s)
                coefs[0] = prev_dc[ci] * q[0]
                kz = 1
                while kz < 64:
                    rs = read_huff(huff[(1, ac_t)])
                    rr, ss = rs >> 4, rs & 0xF
                    if ss == 0:
                        if rr == 15:
                            kz += 16  # ZRL
                            continue
                        break  # EOB
                    kz += rr
                    coefs[_ZIGZAG[kz]] = receive_extend(ss) * q[kz]
                    kz += 1
                # IDCT: f = A^T F A  (A is the orthonormal DCT-II matrix)
                block = a.T @ coefs.reshape(8, 8) @ a + 128.0
                planes[ci][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = block

    cropped = [np.floor(p[:height, :width] + 0.5) for p in planes]
    if nc == 1:
        pixel_sum = int(np.clip(cropped[0], 0, 255).sum())
    else:
        y, cb, cr = (np.clip(c, 0, 255) for c in cropped)
        r = np.clip(np.floor(y + 1.402 * (cr - 128) + 0.5), 0, 255)
        g = np.clip(
            np.floor(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5), 0, 255
        )
        b = np.clip(np.floor(y + 1.772 * (cb - 128) + 0.5), 0, 255)
        pixel_sum = int((r + g + b).sum())
    return width, height, nc, pixel_sum


JPEG_FEATURES_SCHEMA = "doc_id long, width int, height int, n_channels int, pixel_sum long"


def synthesize_jpeg(
    df: DataFrame, id_col: str, r_col: str, g_col: str, b_col: str, w_col: str, h_col: str
) -> DataFrame:
    """Per-row :func:`synth_jpeg_bytes` as an Arrow kernel."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(i), synth_jpeg_bytes(int(r), int(g), int(b), int(w), int(h)))
                for i, r, g, b, w, h in zip(
                    pdf[id_col], pdf[r_col], pdf[g_col], pdf[b_col], pdf[w_col], pdf[h_col]
                )
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "jpeg_bytes"])

    return df.select(
        F.col(id_col), F.col(r_col), F.col(g_col), F.col(b_col), F.col(w_col), F.col(h_col)
    ).mapInPandas(kernel, "doc_id long, jpeg_bytes binary")


def decode_jpeg(df: DataFrame, id_col: str, bytes_col: str) -> DataFrame:
    """Per-row :func:`decode_jpeg_bytes` as an Arrow kernel — the third
    real codec (after WAV and PNG) on the identical mapInPandas shape."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(i), *decode_jpeg_bytes(bytes(b)))
                for i, b in zip(pdf[id_col], pdf[bytes_col])
            ]
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "n_channels", "pixel_sum"]
            )

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(kernel, JPEG_FEATURES_SCHEMA)


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
