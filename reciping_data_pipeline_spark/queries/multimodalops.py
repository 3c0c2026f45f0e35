"""Multimodal catalog queries over the ``documents`` table.

The testdata has no real media, so media bytes are synthesized
deterministically as ``encode(text, 'UTF-8')`` — an opaque binary
column exactly as a real media table would carry — and run through the
operators/multimodal.py plumbing: JVM-side metadata, Arrow-batched
mapInPandas decode (deterministic fake), 1:N frame sampling.

``doc_media_meta`` has a full DuckDB oracle (length/sha256 are
SQL-expressible); the mapInPandas kernels are rows-only checks plus a
frame-count oracle that validates the 1:N expansion arithmetic in SQL.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from reciping_data_pipeline_spark.operators import multimodal
from reciping_data_pipeline_spark.queries import query
from reciping_data_pipeline_spark.tables import load_table


def _with_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.encode(F.col("text"), "UTF-8").alias("media_bytes"),
    )


# DuckDB mirror of operators/multimodal._fake_decode: byte k of
# sha256(utf8(text)) recovered from hex digits 2k+1, 2k+2 of DuckDB's
# sha256() hex string. mean_luma = round(sum(bytes 2..9)/8/255, 4)
# printed at 4 decimals; the 4-dp grid has NO representable ties
# (s·10000/2040 = k+0.5 has no integer solution), so Python round ==
# DuckDB round regardless of tie rules.
def _hexv(i: int) -> str:
    return f"(strpos('0123456789abcdef', substr(hx, {i}, 1)) - 1)"


def _byte(k: int) -> str:
    return f"({_hexv(2 * k + 1)} * 16 + {_hexv(2 * k + 2)})"


_FAKE_DECODE_ORACLE = f"""
    WITH h AS (SELECT doc_id, sha256(text) AS hx FROM documents)
    SELECT doc_id,
           64 + {_byte(0)} % 192 AS width,
           64 + {_byte(1)} % 192 AS height,
           3 AS n_channels,
           printf('%.4f', round(({' + '.join(_byte(k) for k in range(2, 10))})
                                / 8.0 / 255.0, 4)) AS mean_luma
    FROM h
"""


@query(
    "doc_media_meta",
    oracle="""
    SELECT doc_id,
           'image' AS media_type, 'png' AS format,
           octet_length(encode(text)) AS byte_len,
           sha256(text) AS sha256
    FROM documents
    """,
    doc="Opaque-binary media column + JVM-side typed metadata (length, "
    "sha256) — operators/multimodal.py attach_media_meta; no Python in "
    "the plan.",
    tags=("multimodal", "binary"),
)
def doc_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _with_media(spark, sf_dir)
    with_meta = multimodal.attach_media_meta(media, "media_bytes", "image", "png")
    return with_meta.select(
        "doc_id",
        F.col("media_meta.media_type").alias("media_type"),
        F.col("media_meta.format").alias("format"),
        F.col("media_meta.byte_len").alias("byte_len"),
        F.col("media_meta.sha256").alias("sha256"),
    )


@query(
    "doc_image_decode_fake",
    oracle=_FAKE_DECODE_ORACLE,
    doc="Arrow-batched mapInPandas image decode (deterministic fake stub "
    "standing in for Pillow) — schema/batching/pruning plumbing is real; "
    "operators/multimodal.py decode_image. Driver-hashed since r06: the "
    "stub derives (width, height, mean_luma) from sha256 of the bytes, "
    "which DuckDB mirrors with hex-digit arithmetic over its own "
    "sha256() — so the hash row checks the ENTIRE Arrow round-trip "
    "(column pruning into the Python exchange, batch iteration, byte "
    "fidelity through the encode/decode boundary, the %.4f luma "
    "formatting), exactly the plumbing a real Pillow kernel would ride.",
    tags=("multimodal", "pandas-udf"),
)
def doc_image_decode_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.decode_image(_with_media(spark, sf_dir), "doc_id", "media_bytes", fake=True)


@query(
    "doc_frame_sample_counts",
    oracle="""
    SELECT doc_id,
           CAST(least(8, greatest(1, octet_length(encode(text)) // 10)) AS INT) AS n_frames
    FROM documents
    """,
    doc="1:N frame sampling via the mapInPandas generator contract; the "
    "per-doc frame count (min(8, len/10)) is oracle-checked in SQL, the "
    "frame bytes themselves are the stub slices.",
    tags=("multimodal", "pandas-udf"),
)
def doc_frame_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = multimodal.sample_frames(
        _with_media(spark, sf_dir), "doc_id", "media_bytes", every_n=10, max_frames=8
    )
    return frames.groupBy("doc_id").agg(F.count("*").cast("int").alias("n_frames"))


@query(
    "doc_image_resize_fake",
    oracle="""
    SELECT doc_id, 224 AS width, 224 AS height,
           CAST(224 * 224 * 3 // 64 AS BIGINT) AS resized_len
    FROM documents
    """,
    doc="Image resize normalization via mapInPandas (stub codec, real "
    "Arrow plumbing): output buffer length is deterministic "
    "(w*h*3/64), oracle-checked; bytes themselves are the stub.",
    tags=("multimodal", "pandas-udf"),
)
def doc_image_resize_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    resized = multimodal.resize_image(
        _with_media(spark, sf_dir), "doc_id", "media_bytes", width=224, height=224, fake=True
    )
    return resized.select(
        "doc_id", "width", "height",
        F.length("resized_bytes").cast("bigint").alias("resized_len"),
    )


@query(
    "doc_audio_features_fake",
    oracle="""
    SELECT doc_id,
           CAST((octet_length(encode(text)) // 2) * 1000 // 16000 AS BIGINT)
               AS duration_ms,
           16000 AS sample_rate
    FROM documents
    """,
    doc="Audio feature extraction via mapInPandas (stub codec): "
    "duration arithmetic (2-byte mono PCM at 16 kHz) is "
    "oracle-checked; rms is the sha-derived stub (dropped from the "
    "oracled projection).",
    tags=("multimodal", "pandas-udf"),
)
def doc_audio_features_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = multimodal.extract_audio_features(
        _with_media(spark, sf_dir), "doc_id", "media_bytes", sample_rate=16_000, fake=True
    )
    return feats.select("doc_id", "duration_ms", F.col("sample_rate").cast("int").alias("sample_rate"))


@query(
    "doc_wav_roundtrip",
    oracle="""
    SELECT doc_id,
           1 AS n_channels,
           16000 AS sample_rate,
           CAST((n_chars % 100 + 1) * 160 AS BIGINT) AS n_frames,
           CAST((n_chars % 100 + 1) * 160 * 1000 // 16000 AS BIGINT) AS duration_ms,
           CAST(doc_id % 1000 + 1000 AS BIGINT) AS rms_int
    FROM documents
    """,
    doc="REAL audio codec round-trip (stdlib wave, no stub): synthesize "
    "genuine RIFF/WAVE PCM16 square-wave bytes per doc, decode them "
    "back with a real parser, and hash-match every decoded feature "
    "(channels, rate, frames, duration, exact integer RMS) against "
    "the closed-form oracle — proving the multimodal mapInPandas "
    "plumbing carries a true decoder end-to-end.",
    tags=("multimodal", "audio", "codec"),
)
def doc_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.pmod(F.col("doc_id"), F.lit(1000)) + 1000).alias("amp"),
        ((F.pmod(F.col("n_chars"), F.lit(100)) + 1) * 160).alias("frames"),
    )
    wav = multimodal.synthesize_wav(docs, "doc_id", "amp", "frames")
    return multimodal.decode_wav(wav, "doc_id", "wav_bytes")


@query(
    "doc_png_roundtrip",
    oracle="""
    WITH d AS (
        SELECT doc_id, doc_id % 32 + 8 AS w, n_chars % 32 + 8 AS h
        FROM documents
    )
    SELECT d.doc_id,
           CAST(d.w AS INT) AS width,
           CAST(d.h AS INT) AS height,
           3 AS n_channels,
           8 AS bit_depth,
           -- exact integer sum of every RGB sample of the gradient
           -- image pixel(x,y) = ((id+x)%256, (id+y)%256, (x+y)%256),
           -- recomputed from first principles via lateral ranges (the
           -- oracle never touches PNG bytes — only the decoder's
           -- arithmetic contract). CAST: DuckDB sums to HUGEINT.
           CAST(sum((d.doc_id + x.range) % 256
                    + (d.doc_id + y.range) % 256
                    + (x.range + y.range) % 256) AS BIGINT) AS pixel_sum
    FROM d, range(0, 40) x, range(0, 40) y
    WHERE x.range < d.w AND y.range < d.h
    GROUP BY d.doc_id, d.w, d.h
    """,
    doc="REAL image codec round-trip (stdlib zlib/struct, no Pillow): "
    "synthesize spec-compliant 8-bit RGB PNGs per doc — chunk CRCs, "
    "zlib IDAT, row filters cycling through ALL five PNG filter types "
    "(None/Sub/Up/Average/Paeth) — then decode them back with a true "
    "parser (CRC verification, inflate, filter reconstruction) and "
    "hash-match every decoded feature including the exact integer sum "
    "of all reconstructed samples against a closed-form oracle. The "
    "image sibling of doc_wav_roundtrip: the multimodal mapInPandas "
    "plumbing carries a genuine image decoder end-to-end.",
    tags=("multimodal", "image", "codec"),
)
def doc_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.pmod(F.col("doc_id"), F.lit(32)) + 8).alias("w"),
        (F.pmod(F.col("n_chars"), F.lit(32)) + 8).alias("h"),
    )
    png = multimodal.synthesize_png(docs, "doc_id", "w", "h")
    return multimodal.decode_png(png, "doc_id", "png_bytes")


@query(
    "doc_gif_frame_sample",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               doc_id % 16 + 8 AS w, n_chars % 16 + 8 AS h,
               doc_id % 4 + 2 AS nf
        FROM documents
    )
    SELECT d.doc_id,
           CAST(f.range AS INT) AS frame_idx,
           CAST(d.w AS INT) AS width,
           CAST(d.h AS INT) AS height,
           -- palette color i = (3i%256, 5i%256, 7i%256); pixel index =
           -- (doc_id + frame + x + y) % 64 — the exact pattern the
           -- encoder writes and LZW losslessly round-trips
           CAST(sum(((d.doc_id + f.range + x.range + y.range) % 64 * 3) % 256
                    + ((d.doc_id + f.range + x.range + y.range) % 64 * 5) % 256
                    + ((d.doc_id + f.range + x.range + y.range) % 64 * 7) % 256)
                AS BIGINT) AS rgb_sum
    FROM d, range(0, 6) f, range(0, 24) x, range(0, 24) y
    WHERE f.range < d.nf AND f.range % 2 = 0
      AND x.range < d.w AND y.range < d.h
    GROUP BY d.doc_id, f.range, d.w, d.h
    """,
    doc="REAL animated-GIF codec + frame sampling (stdlib LZW, no "
    "codec library): per doc, a multi-frame GIF89a is encoded (global "
    "color table, per-frame graphics-control extensions, variable-"
    "width LZW with sub-block framing) and decoded back frame-by-frame "
    "by a true LZW decoder; every-2nd-frame sampling is then a "
    "RELATIONAL filter over the 1:N decoded rows — codec and sampling "
    "policy decoupled, unlike the byte-slice stub. GIF is lossless, so "
    "each frame's palette-RGB pixel sum is closed-form and the oracle "
    "recomputes it from first principles. The fourth real codec (WAV, "
    "PNG, JPEG, GIF) on the same mapInPandas plumbing.",
    tags=("multimodal", "video", "codec"),
)
def doc_gif_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.pmod(F.col("doc_id"), F.lit(16)) + 8).alias("w"),
        (F.pmod(F.col("n_chars"), F.lit(16)) + 8).alias("h"),
        (F.pmod(F.col("doc_id"), F.lit(4)) + 2).alias("nf"),
    )
    gif = multimodal.synthesize_gif(docs, "doc_id", "w", "h", "nf")
    frames = multimodal.decode_gif_frames(gif, "doc_id", "gif_bytes")
    return frames.where(F.pmod(F.col("frame_idx"), F.lit(2)) == 0)


# The YCbCr forward+inverse chain as SQL, mirroring multimodal.py
# _rgb_to_ycbcr/_ycbcr_to_rgb term-for-term: every constant is written
# in eN notation (DuckDB types bare decimals as DECIMAL, which would
# change the arithmetic), every rounding is floor(x + 0.5), and every
# clamp is least/greatest — identical IEEE ops in both engines.
_JPEG_YCBCR_SQL = """
        SELECT doc_id, w, h,
               least(255e0, greatest(0e0,
                   floor(0.299e0 * r + 0.587e0 * g + 0.114e0 * b + 0.5e0))) AS y,
               least(255e0, greatest(0e0,
                   floor(128e0 - 0.168736e0 * r - 0.331264e0 * g + 0.5e0 * b + 0.5e0))) AS cb,
               least(255e0, greatest(0e0,
                   floor(128e0 + 0.5e0 * r - 0.418688e0 * g - 0.081312e0 * b + 0.5e0))) AS cr
        FROM colors
"""


@query(
    "doc_jpeg_roundtrip",
    oracle=f"""
    WITH colors AS (
        SELECT doc_id,
               doc_id % 24 + 8 AS w, n_chars % 24 + 8 AS h,
               CAST(doc_id % 256 AS DOUBLE) AS r,
               CAST((doc_id * 7) % 256 AS DOUBLE) AS g,
               CAST((doc_id * 13) % 256 AS DOUBLE) AS b
        FROM documents
    ),
    ycc AS ({_JPEG_YCBCR_SQL}),
    rgb AS (
        SELECT doc_id, w, h,
               least(255e0, greatest(0e0,
                   floor(y + 1.402e0 * (cr - 128e0) + 0.5e0))) AS r2,
               least(255e0, greatest(0e0,
                   floor(y - 0.344136e0 * (cb - 128e0) - 0.714136e0 * (cr - 128e0) + 0.5e0))) AS g2,
               least(255e0, greatest(0e0,
                   floor(y + 1.772e0 * (cb - 128e0) + 0.5e0))) AS b2
        FROM ycc
    )
    SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           3 AS n_channels,
           CAST(w * h * (r2 + g2 + b2) AS BIGINT) AS pixel_sum
    FROM rgb
    """,
    doc="REAL baseline-JPEG codec round-trip (stdlib+numpy, no codec "
    "library): per doc, a solid-color image is encoded as a "
    "spec-complete JFIF stream (SOI/APP0/DQT/SOF0/DHT/SOS, float DCT, "
    "all-ones quantization, DC-differential + AC run-length Huffman "
    "with byte stuffing) and decoded back by a true baseline decoder "
    "(embedded-table Huffman decode, dequant, IDCT, YCbCr->RGB). "
    "Constant blocks make the DCT chain integer-exact, so the oracle "
    "predicts every decoded pixel by mirroring the YCbCr float chain "
    "term-for-term in SQL (eN double constants, floor(x+0.5), "
    "least/greatest clamps). The third real codec (WAV, PNG, JPEG) on "
    "the same mapInPandas plumbing; lossy-path fidelity is covered by "
    "the noise-image bounded-error property test.",
    tags=("multimodal", "image", "codec"),
)
def doc_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(256)).alias("r"),
        F.pmod(F.col("doc_id") * 7, F.lit(256)).alias("g"),
        F.pmod(F.col("doc_id") * 13, F.lit(256)).alias("b"),
        (F.pmod(F.col("doc_id"), F.lit(24)) + 8).alias("w"),
        (F.pmod(F.col("n_chars"), F.lit(24)) + 8).alias("h"),
    )
    jpg = multimodal.synthesize_jpeg(docs, "doc_id", "r", "g", "b", "w", "h")
    return multimodal.decode_jpeg(jpg, "doc_id", "jpeg_bytes")


@query(
    "doc_video_frame_decode",
    oracle="""
    WITH colors AS (
        SELECT d.doc_id,
               d.doc_id % 16 + 8 AS w, d.n_chars % 16 + 8 AS h,
               CAST(f.range AS INT) AS frame_idx,
               CAST((d.doc_id + f.range) % 256 AS DOUBLE) AS r,
               CAST(((d.doc_id + f.range) * 7) % 256 AS DOUBLE) AS g,
               CAST(((d.doc_id + f.range) * 13) % 256 AS DOUBLE) AS b
        FROM documents d, range(0, 5) f
        WHERE f.range < d.doc_id % 3 + 2
    ),
    ycc AS (
        SELECT doc_id, w, h, frame_idx,
               least(255e0, greatest(0e0,
                   floor(0.299e0 * r + 0.587e0 * g + 0.114e0 * b + 0.5e0))) AS y,
               least(255e0, greatest(0e0,
                   floor(128e0 - 0.168736e0 * r - 0.331264e0 * g + 0.5e0 * b + 0.5e0))) AS cb,
               least(255e0, greatest(0e0,
                   floor(128e0 + 0.5e0 * r - 0.418688e0 * g - 0.081312e0 * b + 0.5e0))) AS cr
        FROM colors
    ),
    rgb AS (
        SELECT doc_id, w, h, frame_idx,
               least(255e0, greatest(0e0,
                   floor(y + 1.402e0 * (cr - 128e0) + 0.5e0))) AS r2,
               least(255e0, greatest(0e0,
                   floor(y - 0.344136e0 * (cb - 128e0) - 0.714136e0 * (cr - 128e0) + 0.5e0))) AS g2,
               least(255e0, greatest(0e0,
                   floor(y + 1.772e0 * (cb - 128e0) + 0.5e0))) AS b2
        FROM ycc
    )
    SELECT doc_id, frame_idx,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(w * h * (r2 + g2 + b2) AS BIGINT) AS pixel_sum
    FROM rgb
    """,
    doc="REAL video frame decode (stdlib, no ffmpeg): per doc, a "
    "multi-frame MJPEG-in-AVI stream is muxed (RIFF envelope, hdrl/"
    "strl headers, even-padded '00dc' movi chunks whose payloads are "
    "spec-complete baseline JPEGs) and demuxed back — every frame is "
    "decoded by the true JPEG decoder, 1:N through the mapInPandas "
    "generator contract. Solid frames are integer-exact through the "
    "DCT chain, so the oracle predicts each frame's pixel sum by "
    "mirroring the per-frame YCbCr float chain in SQL. Closes the "
    "video-stub gap: the container walk and the per-frame codec are "
    "both real; only non-MJPEG compression (h264 etc.) remains out of "
    "stdlib reach.",
    tags=("multimodal", "video", "codec"),
)
def doc_video_frame_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.pmod(F.col("doc_id"), F.lit(16)) + 8).alias("w"),
        (F.pmod(F.col("n_chars"), F.lit(16)) + 8).alias("h"),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 2).alias("nf"),
    )
    avi = multimodal.synthesize_video(docs, "doc_id", "w", "h", "nf")
    return multimodal.decode_video_frames(avi, "doc_id", "avi_bytes")
