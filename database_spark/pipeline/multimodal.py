"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

Training-data-pipeline extension.  The Spark-side contract — schema,
partition sizing, Arrow-batched UDF signatures — AND the image decode
are real: PNG/BMP decode ships in-repo on stdlib+numpy
(media_codec.py), with Pillow picked up automatically when installed
(JPEG etc.).  `fake=True` remains for tests that want a hash-derived
feature independent of pixel content; audio/video decode still needs
an external library.

Design for 100 TB of media:
* content is `binary` with a typed `meta` struct (mime, width, height,
  duration_ms) — metadata filters prune *before* any decode;
* decode runs in `mapInPandas` (Arrow batches of bytes → batches of
  features), sized by `spark.sql.files.maxPartitionBytes` so one batch
  of raw media fits executor memory;
* frame sampling emits (asset_id, frame_no) rows — a generator UDF, so
  one video row fans out without materializing all frames driver-side.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("content", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType(), True),
                    StructField("width", LongType(), True),
                    StructField("height", LongType(), True),
                    StructField("duration_ms", LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_no", LongType(), False),
        StructField("ts_ms", LongType(), False),
    ]
)


def _fake_feature(content: bytes, dim: int) -> list[float]:
    """Deterministic stand-in feature: bytes → hash-seeded values."""
    import hashlib

    out = []
    h = hashlib.md5(content or b"").digest()
    for i in range(dim):
        b = h[(i * 3) % len(h)]
        out.append((b / 255.0) * 2.0 - 1.0)
    return out


def extract_features(df: DataFrame, dim: int = 16, fake: bool = False) -> DataFrame:
    """content binary → feature vector via Arrow-batched mapInPandas.

    Real path: decode each image (Pillow if installed, else the
    in-repo stdlib PNG/BMP codecs) and emit geometry + color-moment +
    luminance-histogram features.  Undecodable content yields a null
    feature (bad rows must not kill a 100 TB job).  `fake=True`
    substitutes a hash-derived vector (content-independent, for
    plumbing tests).  Either way the distribution shape is batch in →
    batch out, no driver collect.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .media_codec import decode_image, image_features

        for pdf in batches:
            feats = []
            for c in pdf["content"]:
                if fake:
                    feats.append(_fake_feature(c, dim))
                    continue
                try:
                    feats.append(image_features(decode_image(c), dim))
                except (ValueError, TypeError):
                    feats.append(None)
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "feature": feats})

    return df.select("asset_id", "content").mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → (asset_id, frame_no, ts_ms) rows from metadata only —
    no decode needed; real frame extraction would join these rows back
    through the decode UDF."""
    n = (F.col("meta.duration_ms") / every_ms).cast("long")
    return (
        df.where(F.col("meta.duration_ms").isNotNull())
        .select(
            "asset_id",
            F.explode(F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))).alias("frame_no"),
        )
        .withColumn("ts_ms", F.col("frame_no") * every_ms)
    )


def filter_by_meta(
    df: DataFrame,
    mime_prefix: str | None = None,
    min_width: int | None = None,
    min_height: int | None = None,
) -> DataFrame:
    """Metadata pruning — runs entirely on the meta struct columns, so
    parquet nested-column stats skip non-matching row groups without
    reading content bytes."""
    out = df
    if mime_prefix is not None:
        out = out.where(F.col("meta.mime").startswith(mime_prefix))
    if min_width is not None:
        out = out.where(F.col("meta.width") >= min_width)
    if min_height is not None:
        out = out.where(F.col("meta.height") >= min_height)
    return out


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("content", BinaryType(), True),
    ]
)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Decode → nearest-neighbour resize → re-encode PNG, all inside an
    Arrow-batched mapInPandas.  Undecodable rows pass through as null
    content.  Returns (asset_id, content) with content = resized PNG."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .media_codec import decode_image, encode_png, resize_nearest

        for pdf in batches:
            out = []
            for c in pdf["content"]:
                try:
                    out.append(encode_png(resize_nearest(decode_image(c), width, height)))
                except (ValueError, TypeError):
                    out.append(None)
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "content": out})

    return df.select("asset_id", "content").mapInPandas(run, RESIZED_SCHEMA)
