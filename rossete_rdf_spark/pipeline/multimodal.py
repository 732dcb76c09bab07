"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata, processed through mapInPandas in Arrow batches.

The actual media decode is STUBBED (no image/audio libs in this container):
`decode_image_stub` raises NotImplementedError unless `fake=True`, in which
case it produces a deterministic fake feature vector derived from the bytes
— so the Spark-side plumbing (schema, batch iteration, partitioning,
vectorized feature extraction) is real and tested, and a real decoder slots
in by replacing one function."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StringType()),  # JSON metadata (w/h, codec…)
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def decode_image_stub(payload: bytes, fake: bool = True) -> list[float]:
    """STUB: real decode (PIL/libvips resize, mel spectrogram, frame sample)
    is not available in this container. fake=True derives a deterministic
    FEATURE_DIM-vector from the md5 of the bytes so tests pin the plumbing."""
    if not fake:
        raise NotImplementedError("media decoding libraries are not installed")
    h = hashlib.md5(payload or b"").digest()
    return [h[i] / 255.0 for i in range(FEATURE_DIM)]


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas:
    whole-batch control, the shape a real decoder needs for batched GPU/SIMD
    work). One output row per input row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b or b"")).astype("int64"),
                    "features": pdf["payload"].map(decode_image_stub),
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def synth_media(spark, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic fake media table (payload bytes derived from the id)."""
    df = spark.range(0, n, 1, partitions)
    kind = F.element_at(
        F.lit(["image", "audio", "video"]), (F.col("id") % 3 + 1).cast("int")
    )
    payload = F.encode(
        F.concat(F.lit("media-payload-"), F.col("id").cast("string")), "UTF-8"
    )
    meta = F.concat(F.lit('{"w": '), (F.col("id") % 640).cast("string"), F.lit("}"))
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        meta.alias("meta"),
    )


def multimodal_features_query(spark, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: treat each document's text bytes as an opaque
    media payload, run the REAL mapInPandas feature extraction (Arrow batches,
    stubbed decode), and project the result to oracle-exact values: byte count
    plus the first feature recovered as its integer byte (features are
    md5-byte/255 float32s; *255 + round recovers the byte exactly, so the
    DuckDB oracle needs no float comparison)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.lit(["image", "audio", "video"]), (F.col("doc_id") % 3 + 1).cast("int")
        ).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("{}").alias("meta"),
    )
    feats = extract_media_features(media)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.round(F.element_at("features", 1) * 255).cast("long").alias("f0_byte"),
    )
