"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (SURVEY.md north-star): image/audio/video travel as ``binary``
columns with a metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over ``mapInPandas``
— constant memory per batch, no shuffle, scales linearly with input.

The actual media codecs are NOT bundled in this container, so the decode
step is stubbed (clearly marked): ``decode_stub`` derives deterministic
fake dimensions from the payload bytes. The Spark-side plumbing —
schema, batch iteration, partitioning — is real and is what the tests
exercise; swapping the stub for Pillow/ffmpeg is a one-function change.
"""

from __future__ import annotations

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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("checksum_b0", IntegerType()),
    ]
)


def decode_stub(payload: bytes) -> dict:
    """STUB decoder — deterministic fake metadata from bytes.

    Replace with a real decoder (PIL.Image.open / soundfile / pyav) in a
    deployment; the container ships no media libraries
    (NotImplementedError would also be acceptable here, but a
    deterministic fake lets the distributed plumbing be tested
    end-to-end)."""
    n = len(payload)
    return {
        "n_bytes": n,
        "width": 16 + (n % 640),
        "height": 16 + ((n * 7) % 480),
        "checksum_b0": payload[0] if n else 0,
    }


def decode_media(df: DataFrame) -> DataFrame:
    """mapInPandas decode: binary payload batches → metadata rows.
    Arrow moves the bytes; Python touches each batch once."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(
                lambda b: decode_stub(bytes(b) if b is not None else b"")
            )
            out = pd.DataFrame(list(meta))
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out

    return df.mapInPandas(_decode, schema=DECODED_SCHEMA)


def resize_plan(decoded: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning is pure arithmetic on metadata — stays JVM-side;
    only the (stubbed) pixel work would go back through mapInPandas."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side)
        / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return decoded.select(
        "media_id",
        "width",
        "height",
        F.round(scale, 6).alias("scale"),
        F.floor(F.col("width") * scale).cast("int").alias("target_w"),
        F.floor(F.col("height") * scale).cast("int").alias("target_h"),
    )


def frame_sample_plan(
    decoded: DataFrame, n_frames: int = 4, frame_stride_bytes: int = 1024
) -> DataFrame:
    """Frame-sampling plan for video-ish payloads: pick n_frames evenly
    spaced byte offsets (stub for timestamp seeking)."""
    # explicit floor: float→int CAST truncates in Spark but ROUNDS in
    # DuckDB — floor is the portable spelling of the intended semantics
    return decoded.select(
        "media_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(n_frames - 1)),
            lambda i: F.floor(i * F.col("n_bytes") / n_frames).cast("bigint"),
        ).alias("frame_offsets"),
    )
