"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side machinery — schema, partition-friendly batch shapes,
Arrow UDF signatures — is real and tested. Two codecs behind
``DECODERS``:

* ``fake`` (default) — deterministic hash features; exercises the
  full Arrow plumbing with any payload bytes.
* ``real`` — pure-numpy decoders for uncompressed container formats
  that need no external codec library: 24-bit BMP and binary PPM (P6)
  for images, RIFF/WAVE PCM-16 for audio, and concatenated-P6 frame
  streams for video (the format ``ffmpeg -f image2pipe -vcodec ppm``
  emits). Features are defined per modality: a 16-bin integer-luma
  (ITU BT.601, ``(77R+150G+29B)>>8``) histogram for images, per-frame
  luma histograms averaged across frames for video, and RMS energy of
  16 equal time segments for audio. Compressed formats (PNG/JPEG/
  MP3/MP4) still need Pillow/librosa/pyav — plug into ``DECODERS``.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("payload", BinaryType()),     # opaque encoded bytes
    StructField("mime", StringType()),
    StructField("width", IntegerType()),      # typed metadata
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])

FEATURE_DIM = 16


def synth_media(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic opaque media rows (payload = seeded bytes)."""
    kinds = ["image", "audio", "video"]
    mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 4
        rows.append((i, kind, payload, mimes[kind],
                     64 + i % 512 if kind != "audio" else None,
                     64 + (i * 7) % 512 if kind != "audio" else None,
                     1000 + i % 60000 if kind != "image" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_media_real(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic DECODABLE media rows for the ``real`` codec path:
    gray 5x3 BMP images (value ``(i*7)%256`` — width 5 exercises the
    4-byte stride padding), 160-sample constant-amplitude PCM-16 WAVs
    (amplitude ``((i*13)%64)*512``, so the RMS feature is exactly
    ``k/64`` — a 6-decimal-exact value every engine formats
    identically), and 2-frame 4x4 P6 streams (gray values ``(i*5)%256``
    and ``(i*11)%256``). Every feature is closed-form in ``i``, which
    is what lets the contract query pin the real decoders against a
    pure-SQL DuckDB oracle."""
    kinds = ["image", "audio", "video"]
    mimes = {"image": "image/bmp", "audio": "audio/wav",
             "video": "video/x-ppm-stream"}
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            payload = encode_bmp(
                np.full((3, 5, 3), (i * 7) % 256, np.uint8))
            w, h, dur = 5, 3, None
        elif kind == "audio":
            payload = encode_wav_pcm16(
                np.full(160, ((i * 13) % 64) * 512, np.int16))
            w, h, dur = None, None, 10
        else:
            payload = (encode_ppm(np.full((4, 4, 3), (i * 5) % 256,
                                          np.uint8))
                       + encode_ppm(np.full((4, 4, 3), (i * 11) % 256,
                                            np.uint8)))
            w, h, dur = 4, 4, 2000
        rows.append((i, kind, payload, mimes[kind], w, h, dur))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode_features(payload: bytes, kind: str) -> list:
    """Deterministic stand-in for decode + feature extraction.

    Real codecs unavailable in this container; this produces a stable
    FEATURE_DIM-float vector from the payload so downstream plumbing
    (schema, similarity, dedup over features) is fully exercisable.
    """
    h = hashlib.sha256(kind.encode() + payload).digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


# ---------------------------------------------------------------------------
# real codecs: pure-numpy encoders/decoders for uncompressed formats
# ---------------------------------------------------------------------------

def encode_bmp(arr) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit uncompressed
    bottom-up BMP (BITMAPINFOHEADER) — rows padded to 4-byte stride,
    pixels stored BGR, exactly the layout every BMP reader expects."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for row in a[::-1]:                       # bottom-up row order
        line = row[:, ::-1].tobytes()         # RGB -> BGR
        body += line + b"\x00" * (stride - len(line))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    return header + dib + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an (H, W, 3) uint8 RGB
    array. Handles stride padding, BGR order, bottom-up (positive
    height) and top-down (negative height) row layouts."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit uncompressed BMP is supported "
                         f"(bpp={bpp}, compression={comp})")
    bottom_up, h = h > 0, abs(h)
    stride = (w * 3 + 3) & ~3
    rows = (np.frombuffer(payload, np.uint8, stride * h, off)
            .reshape(h, stride)[:, :w * 3]
            .reshape(h, w, 3)[:, :, ::-1])    # BGR -> RGB
    return rows[::-1] if bottom_up else rows


def encode_ppm(arr) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as binary PPM (P6)."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def _ppm_token(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Next header token of a PPM, skipping whitespace and # comments."""
    n = len(payload)
    while pos < n:
        c = payload[pos:pos + 1]
        if c == b"#":
            while pos < n and payload[pos:pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            break
    start = pos
    while pos < n and not payload[pos:pos + 1].isspace():
        pos += 1
    if start == pos:
        raise ValueError("truncated PPM header")
    return payload[start:pos], pos


def decode_ppm_stream(payload: bytes) -> list:
    """Decode one-or-more concatenated binary PPM (P6) images — the
    frame-stream format ``ffmpeg -f image2pipe -vcodec ppm`` produces.
    Returns a list of (H, W, 3) uint8 RGB arrays."""
    frames, pos, n = [], 0, len(payload)
    while pos < n:
        magic, pos = _ppm_token(payload, pos)
        if magic != b"P6":
            raise ValueError(f"not a P6 PPM frame at offset {pos}")
        w, pos = _ppm_token(payload, pos)
        h, pos = _ppm_token(payload, pos)
        maxval, pos = _ppm_token(payload, pos)
        if int(maxval) != 255:
            raise ValueError("only maxval=255 PPM is supported")
        pos += 1                               # single whitespace byte
        w, h = int(w), int(h)
        frames.append(np.frombuffer(payload, np.uint8, w * h * 3, pos)
                      .reshape(h, w, 3))
        pos += w * h * 3
        while pos < n and payload[pos:pos + 1].isspace():
            pos += 1                           # inter-frame padding
    if not frames:
        raise ValueError("empty PPM stream")
    return frames


def encode_wav_pcm16(samples, sample_rate: int = 16000,
                     channels: int = 1) -> bytes:
    """Encode int16 samples (interleaved if multi-channel) as a
    RIFF/WAVE PCM-16 file."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * channels * 2, channels * 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav_pcm16(payload: bytes) -> tuple:
    """Decode a RIFF/WAVE PCM-16 payload to (mono float64 samples in
    int16 units, sample_rate). Multi-channel input is mixed to mono by
    per-frame mean; chunks are walked by id so extra chunks (LIST,
    fact, ...) are skipped, with word-aligned chunk sizes."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    pos, n = 12, len(payload)
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if pos + 8 + size > n:
            # declared chunk size runs past the payload: a truncated
            # transfer. Slicing would silently decode a shortened
            # sample array (wrong features, no error) — reject instead.
            raise ValueError(
                f"WAV chunk {cid!r} declares {size} bytes but only "
                f"{n - pos - 8} remain (truncated payload)")
        if cid == b"fmt ":
            fmt = payload[pos + 8:pos + 8 + size]
        elif cid == b"data":
            data = payload[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(data) % 2 != 0:
        raise ValueError("WAV PCM-16 data chunk has odd byte length")
    if len(fmt) < 16:
        # a well-framed but short fmt chunk would otherwise surface as
        # struct.error; keep the malformed-payload contract uniform
        raise ValueError(
            f"WAV fmt chunk too short ({len(fmt)} bytes, need >= 16)")
    audio_format, channels, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_format != 1 or bits != 16:
        raise ValueError("only PCM-16 WAV is supported "
                         f"(format={audio_format}, bits={bits})")
    s = np.frombuffer(data, "<i2").astype(np.float64)
    if channels > 1:
        s = s[: len(s) - len(s) % channels] \
            .reshape(-1, channels).mean(axis=1)
    return s, rate


def _luma_hist(img: np.ndarray) -> list:
    """16-bin histogram (fractions, sums to 1) of integer BT.601 luma
    ``(77R + 150G + 29B) >> 8`` — all-integer, so a gray pixel R=G=B=v
    has luma exactly v on every platform."""
    px = img.reshape(-1, 3).astype(np.int64)
    luma = (77 * px[:, 0] + 150 * px[:, 1] + 29 * px[:, 2]) >> 8
    hist = np.bincount(luma >> 4, minlength=FEATURE_DIM)[:FEATURE_DIM]
    return (hist / luma.size).tolist()


def _real_decode_features(payload: bytes, kind: str) -> list:
    """Decode + feature-extract with the pure-numpy codecs: images ->
    16-bin luma histogram; audio -> RMS energy of 16 equal segments
    (in full-scale units, |sample|/32768); video -> per-frame luma
    histograms averaged across frames."""
    payload = bytes(payload)
    if kind == "image":
        img = (decode_bmp(payload) if payload[:2] == b"BM"
               else decode_ppm_stream(payload)[0])
        return _luma_hist(img)
    if kind == "audio":
        s, _ = decode_wav_pcm16(payload)
        if len(s) == 0:
            return [0.0] * FEATURE_DIM
        s = np.pad(s, (0, (-len(s)) % FEATURE_DIM)) / 32768.0
        segs = s.reshape(FEATURE_DIM, -1)
        return np.sqrt((segs ** 2).mean(axis=1)).tolist()
    if kind == "video":
        frames = decode_ppm_stream(payload)
        return np.mean([_luma_hist(f) for f in frames], axis=0).tolist()
    raise ValueError(f"unknown media kind {kind!r}")


DECODERS = {"fake": _fake_decode_features, "real": _real_decode_features}

FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", IntegerType()),
    StructField("features", ArrayType(FloatType())),
])


def extract_features(media: DataFrame, decoder: str = "fake",
                     feature_dtype: str = "float") -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column.

    Column-pruned input (only media_id/kind/payload reach Python),
    per-batch vectorization, no shuffle — the canonical shape for
    100 TB of media: partition by file group, stream batches through.

    ``feature_dtype``: ``float`` (float32, the realistic storage type
    for feature vectors) or ``double`` (used by the oracle-checked
    contract query — 3 of the 256 possible byte/255 values round
    differently at 6 dp when squeezed through float32, which would
    make a cross-engine value-hash flaky).
    """
    from lexmapr_spark.engine import ship_package
    ship_package(media.sparkSession)

    from lexmapr_spark.ops.util import fan_out

    fn = DECODERS[decoder]
    pruned = fan_out(media.select("media_id", "kind", "payload"))
    schema = StructType([
        f if f.name != "features"
        else StructField("features", ArrayType(
            FloatType() if feature_dtype == "float" else DoubleType()))
        for f in FEATURES_SCHEMA.fields])

    def batches(it):
        for pdf in it:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "features": [fn(p, k) for p, k in
                             zip(pdf["payload"], pdf["kind"])],
            })

    return pruned.mapInPandas(batches, schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame to decode.

    Pure JVM (sequence + explode): the expensive decode stays in
    ``extract_features``; this stage just fans out work units, which
    is how you'd shard frame extraction across a cluster."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(
                F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
