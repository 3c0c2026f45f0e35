"""Hypothesis property tests for the pure-Python/numpy kernels (no
Spark session — these run in milliseconds and cover the combinatorial
input space the example-based tests can't)."""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from reciping_data_pipeline_spark.functions.hashing import _MERSENNE_P, _perm_params
from reciping_data_pipeline_spark.operators.multimodal import _fake_decode
from reciping_data_pipeline_spark.pipeline.datagen import ab_group
from reciping_data_pipeline_spark.sources.jsonl import interval_paths

_dt = st.datetimes(min_value=datetime(2000, 1, 1), max_value=datetime(2099, 12, 31))


@given(start=_dt, minutes=st.integers(min_value=1, max_value=24 * 60))
@settings(max_examples=200, deadline=None)
def test_interval_paths_cover_and_align(start, minutes):
    end = start + timedelta(minutes=minutes)
    paths = interval_paths("/s", start, end)
    assert paths  # non-empty for any non-empty interval
    assert len(paths) == len(set(paths))  # no duplicate buckets
    # each path's bucket is 15-min aligned and within [start-15m, end)
    for p in paths:
        parts = dict(kv.split("=") for kv in p.split("/")[2:])
        t = datetime(
            int(parts["year"]), int(parts["month"]), int(parts["day"]),
            int(parts["hour"]), int(parts["minute"]),
        )
        assert t.minute % 15 == 0
        assert start - timedelta(minutes=15) < t < end
    # first bucket contains `start`
    first = paths[0]
    assert f"minute={(start.minute // 15) * 15:02d}" in first


@given(uid=st.text(min_size=1, max_size=30))
@settings(max_examples=200, deadline=None)
def test_ab_group_deterministic_and_binary(uid):
    g = ab_group(uid)
    assert g in ("treatment", "control")
    assert ab_group(uid) == g  # stable


@given(n=st.integers(min_value=1, max_value=256), seed=st.integers(min_value=0, max_value=2**31))
@settings(max_examples=100, deadline=None)
def test_perm_params_in_field(n, seed):
    params = _perm_params(n, seed)
    assert len(params) == n
    for a, b in params:
        assert 1 <= a < _MERSENNE_P  # a=0 would collapse the permutation
        assert 0 <= b < _MERSENNE_P
        # a * x + b stays below 2^63 for x < p (no silent long overflow)
        assert a * (_MERSENNE_P - 1) + b < 2**63


@given(data=st.binary(min_size=0, max_size=200))
@settings(max_examples=200, deadline=None)
def test_fake_decode_deterministic_and_bounded(data):
    w, h, c, luma = _fake_decode(data)
    assert (w, h, c, luma) == _fake_decode(data)
    assert 64 <= w < 256 and 64 <= h < 256 and c == 3
    assert 0.0 <= luma <= 1.0


@given(
    hashes=st.lists(
        st.lists(st.integers(min_value=0, max_value=_MERSENNE_P - 1), min_size=0, max_size=30),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=50, deadline=None)
def test_minhash_batch_equals_rowwise(spark, hashes):
    """The reduceat-vectorized MinHash kernel must equal the naive
    per-row formulation bit-for-bit. (`spark` fixture: pandas_udf needs
    an active context just to parse its return-type DDL; the kernel
    itself runs driver-side here.)"""
    import pandas as pd

    from reciping_data_pipeline_spark.functions import sketches

    num_perm, seed = 16, 42
    params = _perm_params(num_perm, seed)
    a = np.array([p[0] for p in params], dtype=np.uint64).reshape(-1, 1)
    b = np.array([p[1] for p in params], dtype=np.uint64).reshape(-1, 1)

    udf_fn = sketches.minhash_signature_udf(num_perm, seed)
    batch = udf_fn.func(pd.Series([np.array(h, dtype=np.int64) for h in hashes]))

    for got, h in zip(batch, hashes):
        if not h:
            assert list(got) == [_MERSENNE_P] * num_perm
            continue
        hv = np.asarray(h, dtype=np.uint64)
        want = ((a * hv + b) % np.uint64(_MERSENNE_P)).min(axis=1).astype(np.int64)
        assert list(got) == list(want)


@given(
    amp=st.integers(min_value=0, max_value=32_767),
    n_frames=st.integers(min_value=0, max_value=4_096),
)
@settings(max_examples=150, deadline=None)
def test_wav_codec_round_trip_exact(amp, n_frames):
    """The real WAV codec round-trips exactly for any (amp, frames):
    square-wave RMS equals the amplitude, frame count and duration are
    preserved, including the empty-audio edge."""
    from reciping_data_pipeline_spark.operators.multimodal import (
        decode_wav_bytes,
        synth_wav_bytes,
    )

    nch, sr, nf, dur_ms, rms = decode_wav_bytes(synth_wav_bytes(amp, n_frames))
    assert (nch, sr, nf) == (1, 16_000, n_frames)
    assert dur_ms == n_frames * 1000 // 16_000
    assert rms == (amp if n_frames else 0)


@given(
    doc_id=st.integers(min_value=0, max_value=10**12),
    width=st.integers(min_value=1, max_value=48),
    height=st.integers(min_value=1, max_value=48),
)
@settings(max_examples=80, deadline=None)
def test_png_codec_round_trip_exact(doc_id, width, height):
    """The real PNG codec round-trips exactly for any (id, w, h): the
    decoder's filter reconstruction (heights > 4 cycle through all five
    PNG filter types) recovers the gradient image bit-for-bit, so the
    sample sum matches the closed form."""
    from reciping_data_pipeline_spark.operators.multimodal import (
        decode_png_bytes,
        synth_png_bytes,
    )

    w, h, ch, depth, psum = decode_png_bytes(synth_png_bytes(doc_id, width, height))
    assert (w, h, ch, depth) == (width, height, 3, 8)
    want = sum(
        (doc_id + x) % 256 + (doc_id + y) % 256 + (x + y) % 256
        for x in range(width)
        for y in range(height)
    )
    assert psum == want


def test_png_decoder_rejects_corruption_and_reads_foreign_shapes():
    """Decoder rigor: a flipped payload byte fails the CRC check (no
    silent garbage); grayscale and RGBA images from a foreign encoder
    (hand-built, filter 0) decode with the right channel counts; and
    decode_image routes PNG-signatured bytes through the REAL decoder."""
    import struct
    import zlib

    import pytest as _pytest

    from reciping_data_pipeline_spark.operators.multimodal import (
        PNG_SIG,
        _png_chunk,
        decode_png_bytes,
        synth_png_bytes,
    )

    data = bytearray(synth_png_bytes(7, 16, 16))
    data[len(data) // 2] ^= 0xFF  # corrupt inside IDAT
    with _pytest.raises(ValueError, match="CRC"):
        decode_png_bytes(bytes(data))

    def foreign_png(width, height, channels, color_type, pixel_val):
        raw = bytes([pixel_val]) * (width * channels)
        stream = b"".join(b"\x00" + raw for _ in range(height))
        ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
        return (
            PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(stream))
            + _png_chunk(b"IEND", b"")
        )

    w, h, ch, depth, psum = decode_png_bytes(foreign_png(5, 3, 1, 0, 200))
    assert (w, h, ch, depth, psum) == (5, 3, 1, 8, 200 * 5 * 3)
    w, h, ch, depth, psum = decode_png_bytes(foreign_png(4, 2, 4, 6, 10))
    assert (w, h, ch, depth, psum) == (4, 2, 4, 8, 10 * 4 * 4 * 2)


@given(
    r=st.integers(min_value=0, max_value=255),
    g=st.integers(min_value=0, max_value=255),
    b=st.integers(min_value=0, max_value=255),
    width=st.integers(min_value=1, max_value=40),
    height=st.integers(min_value=1, max_value=40),
)
@settings(max_examples=60, deadline=None)
def test_jpeg_codec_solid_round_trip_exact(r, g, b, width, height):
    """The real baseline-JPEG codec round-trips solid colors EXACTLY
    for any (color, w, h) including non-multiple-of-8 shapes (edge
    replication + crop): constant blocks carry one DC coefficient whose
    all-ones-quantization chain is integer-exact, so decoded pixels are
    the deterministic YCbCr round trip of the input color."""
    from reciping_data_pipeline_spark.operators.multimodal import (
        _rgb_to_ycbcr,
        _ycbcr_to_rgb,
        decode_jpeg_bytes,
        synth_jpeg_bytes,
    )

    w, h, nc, psum = decode_jpeg_bytes(synth_jpeg_bytes(r, g, b, width, height))
    rr, gg, bb = _ycbcr_to_rgb(*_rgb_to_ycbcr(r, g, b))
    assert (w, h, nc) == (width, height, 3)
    assert psum == width * height * (rr + gg + bb)


def test_jpeg_codec_arbitrary_image_bounded_error_and_rigor():
    """General-encoder rigor: a full random image runs the complete
    DCT / zigzag / run-length / Huffman path (AC coefficients, ZRL,
    byte stuffing) and decodes with only coefficient-rounding loss
    (mean abs error well under 1 per sample with all-ones tables);
    truncated streams and non-baseline markers raise instead of
    returning garbage."""
    import numpy as np
    import pytest as _pytest

    from reciping_data_pipeline_spark.operators.multimodal import (
        decode_jpeg_bytes,
        encode_jpeg_rgb,
    )

    rng = np.random.default_rng(9)
    pix = rng.integers(0, 256, size=(21, 37, 3)).astype(float)
    data = encode_jpeg_rgb(pix, 37, 21)
    w, h, nc, psum = decode_jpeg_bytes(data)
    assert (w, h, nc) == (37, 21, 3)
    assert abs(psum - pix.sum()) / (37 * 21 * 3) < 0.1  # rounding only

    with _pytest.raises(ValueError, match="SOI"):
        decode_jpeg_bytes(b"not a jpeg")
    # flip SOF0 into progressive SOF2: must refuse, not misdecode
    bad = bytearray(data)
    idx = bad.find(b"\xff\xc0")
    bad[idx + 1] = 0xC2
    with _pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg_bytes(bytes(bad))


@given(
    doc_id=st.integers(min_value=0, max_value=10**12),
    width=st.integers(min_value=1, max_value=40),
    height=st.integers(min_value=1, max_value=40),
    n_frames=st.integers(min_value=1, max_value=6),
)
@settings(max_examples=60, deadline=None)
def test_gif_codec_round_trip_exact(doc_id, width, height, n_frames):
    """The real GIF LZW codec round-trips every frame exactly (GIF is
    lossless): frame count, dimensions, and per-frame palette-RGB sums
    all match the closed form, for any (id, w, h, frames) including
    1x1 frames and dictionary-reset-sized images."""
    from reciping_data_pipeline_spark.operators.multimodal import (
        GIF_PALETTE_SIZE,
        _gif_palette,
        decode_gif_frames_bytes,
        synth_gif_bytes,
    )

    pal = _gif_palette()
    frames = decode_gif_frames_bytes(synth_gif_bytes(doc_id, width, height, n_frames))
    assert len(frames) == n_frames
    for f, (fi, w, h, rgb_sum) in enumerate(frames):
        assert (fi, w, h) == (f, width, height)
        want = sum(
            sum(pal[(doc_id + f + x + y) % GIF_PALETTE_SIZE])
            for y in range(height)
            for x in range(width)
        )
        assert rgb_sum == want


def test_gif_decoder_rigor():
    """Decoder rigor: the LZW path survives a dictionary-growth-heavy
    noise frame (code widths 7→12), bad signatures and truncated
    streams raise, and a hand-built foreign GIF (local color table,
    87a signature) decodes with its own palette."""
    import random
    import struct

    import pytest as _pytest

    from reciping_data_pipeline_spark.operators.multimodal import (
        GIF_PALETTE_BITS,
        _lzw_decode,
        _lzw_encode,
        decode_gif_frames_bytes,
        synth_gif_bytes,
    )

    rng = random.Random(4)
    noise = [rng.randrange(64) for _ in range(64 * 64)]
    assert _lzw_decode(_lzw_encode(noise, GIF_PALETTE_BITS), GIF_PALETTE_BITS) == noise

    with _pytest.raises(ValueError, match="signature"):
        decode_gif_frames_bytes(b"NOTAGIF")
    data = synth_gif_bytes(5, 10, 10, 2)
    with _pytest.raises((ValueError, IndexError)):
        decode_gif_frames_bytes(data[: len(data) // 2])

    # foreign file: GIF87a, no global table, 4-entry LOCAL color table
    lct = bytes((255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9))
    idx = [0, 1, 2, 3] * 4  # 4x4 frame
    payload = _lzw_encode(idx, 2)
    foreign = (
        b"GIF87a" + struct.pack("<HH", 4, 4) + bytes([0, 0, 0])
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 4, 4) + bytes([0x80 | 1])
        + lct + bytes([2, len(payload)]) + payload + b"\x00\x3b"
    )
    frames = decode_gif_frames_bytes(foreign)
    assert frames == [(0, 4, 4, 4 * (255 + 255 + 255 + 27))]


@given(
    doc_id=st.integers(min_value=0, max_value=10**9),
    width=st.integers(min_value=1, max_value=24),
    height=st.integers(min_value=1, max_value=24),
    n_frames=st.integers(min_value=1, max_value=5),
)
@settings(max_examples=40, deadline=None)
def test_avi_mjpeg_round_trip_exact(doc_id, width, height, n_frames):
    """The AVI/MJPEG mux/demux round-trips exactly: RIFF chunk walk
    (incl. odd-length JPEG payloads exercising even padding) recovers
    every frame, and each solid MJPEG frame decodes to its closed-form
    pixel sum through the real JPEG chain."""
    from reciping_data_pipeline_spark.operators.multimodal import (
        _rgb_to_ycbcr,
        _ycbcr_to_rgb,
        decode_avi_frames_bytes,
        synth_avi_mjpeg_bytes,
    )

    frames = decode_avi_frames_bytes(synth_avi_mjpeg_bytes(doc_id, width, height, n_frames))
    assert len(frames) == n_frames
    for f, (fi, w, h, psum) in enumerate(frames):
        c = doc_id + f
        rr, gg, bb = _ycbcr_to_rgb(*_rgb_to_ycbcr(c % 256, (c * 7) % 256, (c * 13) % 256))
        assert (fi, w, h, psum) == (f, width, height, width * height * (rr + gg + bb))


def test_avi_demuxer_rigor():
    """Demuxer rigor: bad signatures, truncated chunks, and frame-less
    containers raise; a non-JPEG '00dc' payload fails inside the JPEG
    decoder instead of producing garbage."""
    import struct

    import pytest as _pytest

    from reciping_data_pipeline_spark.operators.multimodal import (
        _riff_chunk,
        decode_avi_frames_bytes,
        synth_avi_mjpeg_bytes,
    )

    with _pytest.raises(ValueError, match="RIFF"):
        decode_avi_frames_bytes(b"garbage bytes here")
    data = synth_avi_mjpeg_bytes(1, 8, 8, 2)
    with _pytest.raises(ValueError, match="truncated"):
        decode_avi_frames_bytes(data[:-40])
    empty = _riff_chunk(b"RIFF", b"AVI " + _riff_chunk(b"LIST", b"movi"))
    with _pytest.raises(ValueError, match="no video frame"):
        decode_avi_frames_bytes(empty)
    bogus = _riff_chunk(
        b"RIFF", b"AVI " + _riff_chunk(b"LIST", b"movi" + _riff_chunk(b"00dc", b"NOTJPEG"))
    )
    with _pytest.raises(ValueError, match="SOI"):
        decode_avi_frames_bytes(bogus)
    # muxer-side guard: zero frames must fail with a self-explanatory
    # message, not a bare max()-on-empty-list ValueError from deep
    # inside avih header packing (which would kill a whole Arrow batch
    # in synthesize_video with a confusing traceback)
    with _pytest.raises(ValueError, match="n_frames"):
        synth_avi_mjpeg_bytes(1, 8, 8, 0)


def test_decode_image_real_png_path(spark):
    """decode_image without fake=True decodes PNG-signatured bytes with
    the REAL decoder (dimensions + mean luma from reconstructed pixels)
    through the same Arrow kernel the stub uses; non-PNG bytes raise
    inside the kernel rather than returning stub garbage."""
    import pytest as _pytest
    from pyspark.errors import PythonException

    from reciping_data_pipeline_spark.operators import multimodal

    df = spark.createDataFrame(
        [(1, multimodal.synth_png_bytes(1, 10, 4)),
         (2, multimodal.synth_png_bytes(2, 8, 8))],
        "doc_id long, media_bytes binary",
    )
    got = {r["doc_id"]: r for r in multimodal.decode_image(df, "doc_id", "media_bytes").collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["n_channels"]) == (10, 4, 3)
    assert (got[2]["width"], got[2]["height"], got[2]["n_channels"]) == (8, 8, 3)
    _, _, _, _, psum = multimodal.decode_png_bytes(multimodal.synth_png_bytes(1, 10, 4))
    assert got[1]["mean_luma"] == f"{round(psum / (10 * 4 * 3) / 255.0, 4):.4f}"

    not_png = spark.createDataFrame([(3, b"just text bytes")], "doc_id long, media_bytes binary")
    with _pytest.raises(PythonException, match="PNG and baseline JPEG only"):
        multimodal.decode_image(not_png, "doc_id", "media_bytes").collect()


@given(
    names=st.lists(
        st.sampled_from("abcdefgh"), min_size=1, max_size=8, unique=True
    ),
    extra=st.lists(
        st.sampled_from("wxyz"), min_size=0, max_size=4, unique=True
    ),
    split=st.integers(min_value=0, max_value=8),
)
@settings(max_examples=200, deadline=None)
def test_evolved_schema_is_additive_and_order_stable(names, extra, split):
    """snapshots._evolved_schema_json: parent column order is preserved,
    new columns append in incoming order, overlap is idempotent, and
    same-name/same-type overlap never raises."""
    from pyspark.sql.types import LongType, StructField, StructType

    from reciping_data_pipeline_spark.sources.snapshots import _evolved_schema_json

    parent = StructType([StructField(n, LongType()) for n in names])
    incoming_names = names[split:] + extra  # overlap + new columns
    incoming = StructType([StructField(n, LongType()) for n in incoming_names])
    out = StructType.fromJson(
        __import__("json").loads(_evolved_schema_json(parent.json(), incoming))
    )
    assert [f.name for f in out] == names + [n for n in incoming_names if n not in names]
    # idempotent: evolving again with the same incoming changes nothing
    assert _evolved_schema_json(out.json(), incoming) == out.json()


@given(name=st.sampled_from("abc"))
@settings(max_examples=10, deadline=None)
def test_evolved_schema_type_conflict_always_raises(name):
    import json as _json

    import pytest as _pytest
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from reciping_data_pipeline_spark.sources.snapshots import _evolved_schema_json

    parent = StructType([StructField(name, LongType())])
    incoming = StructType([StructField(name, StringType())])
    with _pytest.raises(ValueError):
        _evolved_schema_json(parent.json(), incoming)


# ---------------------------------------------------------------------------
# Cross-engine FP rounding-boundary properties (VERDICT r04 #6).
#
# Three driver reds across rounds r02-r04 were the same defect class: a
# float column rounded at n decimals whose pre-rounding value sat within
# a libm last-ulp of the half boundary, so Spark and DuckDB rounded to
# DIFFERENT grid points. These tests gate the two constructions the
# catalog standardizes on, with inputs DELIBERATELY placed on and
# within-one-ulp of half boundaries — the exact inputs that produced
# the reds.
# ---------------------------------------------------------------------------


def _adversarial_doubles() -> list[float]:
    """Half-boundary-adjacent doubles at 4 and 6 decimals (on the tie,
    one ulp below, one ulp above) plus seeded uniform noise."""
    rng = np.random.default_rng(7)
    vals: list[float] = []
    for n in (4, 6):
        scale = 10**n
        for k in rng.integers(0, 10 * scale, 300):
            x = (int(k) + 0.5) / scale
            vals.extend([x, float(np.nextafter(x, -np.inf)), float(np.nextafter(x, np.inf))])
    vals.extend(float(v) for v in rng.random(500) * 10)
    return vals


def test_floor_half_rounding_bit_identical_across_engines(spark, duck):
    """floor(x * 10^n + 0.5) / 10^n — the catalog's construction for
    value-affecting rounding — must agree EXACTLY between Spark and
    DuckDB for every input, including exact ties and their ulp
    neighbours: it is pure IEEE mul/add/floor, which both engines
    evaluate identically (unlike their round() builtins)."""
    import pandas as pd
    import pyspark.sql.functions as F

    pdf = pd.DataFrame({"i": range(len(_adversarial_doubles())), "x": _adversarial_doubles()})
    sdf = spark.createDataFrame(pdf)
    duck.register("fp_vals", pdf)
    for n in (4, 6):
        s = float(10**n)
        got = [
            r["r"]
            for r in sdf.select("i", (F.floor(F.col("x") * s + 0.5) / s).alias("r"))
            .orderBy("i")
            .collect()
        ]
        want = [
            r[0]
            for r in duck.execute(
                f"SELECT floor(x * {s} + 0.5) / {s} FROM fp_vals ORDER BY i"
            ).fetchall()
        ]
        assert got == want, f"n={n}: first diff at {next(i for i, (a, b) in enumerate(zip(got, want)) if a != b)}"


def test_engine_round_agreement_off_ties(spark, duck):
    """Engine round() builtins DO agree once the value is at least
    1e-9 away from a half boundary at the rounded precision — the
    regime where the catalog still uses round(): display rounding of
    aggregates whose value is not a systematic ratio of small
    integers. (On exact ties they are KNOWN to differ — Spark rounds
    the shortest-decimal repr HALF_UP, DuckDB rounds the binary value
    — which is why value-affecting rounding uses the floor form.)"""
    import pandas as pd
    import pyspark.sql.functions as F

    rng = np.random.default_rng(13)
    raw = rng.random(3000) * 100
    off_tie = [
        float(x)
        for x in raw
        if abs((x * 1e4) % 1.0 - 0.5) > 1e-5  # > 1e-9 absolute at 4dp
    ]
    pdf = pd.DataFrame({"i": range(len(off_tie)), "x": off_tie})
    sdf = spark.createDataFrame(pdf)
    duck.register("fp_off_tie", pdf)
    got = [r["r"] for r in sdf.select("i", F.round("x", 4).alias("r")).orderBy("i").collect()]
    want = [
        r[0] for r in duck.execute("SELECT round(x, 4) FROM fp_off_tie ORDER BY i").fetchall()
    ]
    assert got == want


def test_km_survival_chain_bit_identical_across_engines(spark, duck):
    """The full statops Kaplan-Meier arithmetic chain — coarsen the
    per-step factor to 6 decimals with the floor form, fold an
    order-pinned running PRODUCT over the ordered window (collect_list +
    aggregate HOF vs DuckDB list_aggregate 'product'), final 4-dp
    floor-round — agrees bit-for-bit across engines on adversarial risk
    tables, including n = 10^6 rows where d/n lands EXACTLY on the
    6-decimal coarsening grid (the tie case engine round() gets wrong).
    No ln/exp anywhere: libm transcendentals are only 1-ulp-accurate and
    differ between JVM Math.log/exp and platform libm, which flipped the
    4-dp floor in driver rounds 4-5."""
    import pandas as pd
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    rng = np.random.default_rng(11)
    rows = []
    for g in range(20):
        for t in range(30):
            if g < 5:
                n = 1_000_000  # exact 6-decimal grid: factor coarsening ties
            else:
                n = int(rng.integers(1, 1_000_000))
            d = int(rng.integers(0, max(1, n // 10)))
            rows.append((g, t, d, n))
    pdf = pd.DataFrame(rows, columns=["g", "t", "d", "n"])
    sdf = spark.createDataFrame(pdf)
    duck.register("km_risk", pdf)

    w = Window.partitionBy("g").orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    factor = F.floor((1.0 - F.col("d") * 1.0 / F.col("n")) * 1000000.0 + 0.5) / 1000000.0
    got = {
        (r["g"], r["t"]): r["s"]
        for r in sdf.withColumn("factor", factor)
        .select(
            "g",
            "t",
            (
                F.floor(
                    F.aggregate(
                        F.collect_list("factor").over(w),
                        F.lit(1.0),
                        lambda acc, x: acc * x,
                    )
                    * 10000.0
                    + 0.5
                )
                / 10000.0
            ).alias("s"),
        )
        .collect()
    }
    want = {
        (r[0], r[1]): r[2]
        for r in duck.execute(
            """
            SELECT g, t,
                   floor(list_aggregate(
                       list(floor((1.0 - d * 1.0 / n) * 1000000.0 + 0.5)
                            / 1000000.0)
                       OVER (PARTITION BY g ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                       'product')
                   * 10000.0 + 0.5) / 10000.0
            FROM km_risk
            """
        ).fetchall()
    }
    assert got == want


def test_km_survival_plans_free_of_transcendentals(spark):
    """Gate: neither the Spark optimized plan nor the DuckDB oracle SQL
    of signup_conversion_survival contains ln/exp — the fix for the
    two-round driver red must not regress back to exp(sum(ln))."""
    import re

    from reciping_data_pipeline_spark.queries import all_queries

    q = all_queries()["signup_conversion_survival"]
    df = q.fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert not re.search(r"\b(LOG|EXP|ln)\(", plan, re.IGNORECASE), plan
    sql_no_comments = re.sub(r"--[^\n]*", "", q.oracle)
    assert not re.search(r"\b(ln|exp|log)\s*\(", sql_no_comments, re.IGNORECASE)


@given(
    deltas=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False), max_size=40
    )
)
@settings(max_examples=300, deadline=None)
def test_lindley_reflection_identity(deltas):
    """The identity user_loyalty_balance rests on: the zero-clamped
    recurrence b_t = max(0, b_{t-1} + d_t) equals
    prefix_t - min(0, running_min(prefix)_t) for every input sequence
    (reflected random walk / Lindley recursion)."""
    import itertools
    import math

    b, direct = 0.0, []
    for d in deltas:
        b = max(0.0, b + d)
        direct.append(b)
    pfx = list(itertools.accumulate(deltas))
    runmin = list(itertools.accumulate(pfx, min))
    via_identity = [p - min(0.0, m) for p, m in zip(pfx, runmin)]
    for a, c in zip(direct, via_identity):
        assert math.isclose(a, c, rel_tol=1e-9, abs_tol=1e-9)


def test_max_result_size_parses_all_jvm_memory_suffixes():
    """ADVICE r12: a valid SPARK_DRIVER_MEMORY like '4096m' must derive
    half-the-heap, not fall back to the fixed 8g the derivation exists
    to avoid on small hosts. All JVM suffixes (k/m/g/t, either case)
    and bare-byte values parse; only garbage falls back."""
    from reciping_data_pipeline_spark.session import _default_max_result_size as f

    assert f("4096m") == "2g"
    assert f("2048M") == "1g"
    assert f("8G") == "4g"
    assert f("48g") == "8g"  # capped
    assert f("1t") == "8g"  # capped
    assert f("2g") == "1g"  # floored at 1g
    assert f(str(16 * (1 << 30))) == "8g"  # bare bytes
    assert f("not-a-size") == "8g"  # fallback only for garbage
