"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side machinery — schema, partition-friendly batch shapes,
Arrow UDF signatures — is real and tested; the codec step is stubbed
(no image/audio libs in this container) behind ``DECODERS``: a
deterministic fake decoder by default, ``NotImplementedError`` for
real codecs, so swapping in Pillow/librosa later is a one-line change.
"""

from __future__ import annotations

import hashlib

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


def _fake_decode_features(payload: bytes, kind: str) -> list:
    """Deterministic stand-in for decode + feature extraction.

    Real codecs unavailable in this container; this produces a stable
    FEATURE_DIM-float vector from the payload so downstream plumbing
    (schema, similarity, dedup over features) is fully exercisable.
    """
    h = hashlib.sha256(kind.encode() + payload).digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def _real_decode(payload: bytes, kind: str):
    raise NotImplementedError(
        f"real {kind} decoding needs a codec library (Pillow/librosa/"
        "pyav) not present in this environment; plug it into DECODERS")


DECODERS = {"fake": _fake_decode_features, "real": _real_decode}

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
