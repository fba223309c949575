"""Multimodal + Python-batch (pandas UDF) query surface.

m01 exercises the full multimodal plumbing (binary column → mapInPandas
decode → JVM-side aggregation) with the documents table's text bytes as
stand-in payloads — the byte-level math is SQL-expressible, so even the
Arrow round-trip is oracle-checked. m02 is the applyInPandas
grouped-custom-operator pattern checked against a window-SQL oracle.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from gov_ec_pipeline_etl_spark.operators.multimodal import decode_media
from gov_ec_pipeline_etl_spark.plans.registry import register
from gov_ec_pipeline_etl_spark.plans.util import T


@register(
    "m01_multimodal_decode",
    oracle="""
        SELECT doc_id AS media_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               16 + (octet_length(encode(text)) % 640) AS width,
               16 + ((octet_length(encode(text)) * 7) % 480) AS height
        FROM documents
    """,
    doc="Multimodal plumbing end-to-end: text bytes as stand-in binary "
    "payloads → Arrow-batched mapInPandas decode (stub codec, "
    "deterministic metadata) → typed struct out. The oracle recomputes "
    "the byte math in SQL, so the binary round-trip through Arrow is "
    "value-checked, not just counted.",
    tags=("multimodal", "pandas-udf", "llm-pipeline"),
)
def m01_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )
    return decode_media(media).select("media_id", "n_bytes", "width", "height")


_GAP_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("max_gap_us", LongType()),
    ]
)


@register(
    "m02_apply_in_pandas_gaps",
    oracle="""
        SELECT user_id,
               COUNT(*) AS n_events,
               MAX(epoch_us(ts) - epoch_us(prev_ts)) AS max_gap_us
        FROM (
          SELECT user_id, ts,
                 LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          FROM events
        )
        GROUP BY user_id
    """,
    doc="applyInPandas grouped custom operator (per-user max inter-event "
    "gap): one shuffle on the group key, Arrow batch per group, checked "
    "against the window-SQL oracle. The pattern slot for operators SQL "
    "can't express (the oracle CAN here — that's the point of the test).",
    tags=("pandas-udf", "apply-in-pandas"),
)
def m02_apply_in_pandas_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").select("user_id", "ts", "event_id")

    def gaps(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        # integer microseconds end-to-end: float seconds + rounding would
        # diverge from SQL (Python rounds half-even, SQL half-away)
        us = pdf["ts"].astype("datetime64[us]").astype("int64")
        diffs = us.diff()
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "max_gap_us": [int(diffs.max()) if len(pdf) > 1 else None],
            }
        )

    return ev.groupBy("user_id").applyInPandas(gaps, schema=_GAP_SCHEMA)


@register(
    "m03_resize_frame_plan",
    oracle="""
        WITH meta AS (
          SELECT doc_id AS media_id,
                 octet_length(encode(text)) AS n_bytes,
                 16 + (octet_length(encode(text)) % 640) AS width,
                 16 + ((octet_length(encode(text)) * 7) % 480) AS height
          FROM documents
        )
        SELECT media_id,
               ROUND(least(1.0, 256.0 / greatest(width, height)), 6) AS scale,
               CAST(floor(width  * least(1.0, 256.0 / greatest(width, height))) AS BIGINT) AS target_w,
               CAST(floor(height * least(1.0, 256.0 / greatest(width, height))) AS BIGINT) AS target_h,
               array_to_string(list_transform(range(0, 4), i -> CAST(floor(i * n_bytes / 4) AS BIGINT)), ',') AS frame_offsets
        FROM meta
    """,
    doc="Multimodal planning stages end-to-end: mapInPandas decode (stub "
    "codec) → JVM-side resize planning (scale to max side 256) and "
    "frame-sample offsets (4 evenly spaced) — metadata arithmetic stays "
    "in codegen; only pixel work would return to Python.",
    tags=("multimodal", "llm-pipeline"),
)
def m03_resize_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.multimodal import (
        decode_media,
        frame_sample_plan,
        resize_plan,
    )

    docs = T(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )
    decoded = decode_media(media)
    resized = resize_plan(decoded, max_side=256).select(
        "media_id",
        "scale",
        F.col("target_w").cast("bigint").alias("target_w"),
        F.col("target_h").cast("bigint").alias("target_h"),
    )
    # frame_offsets leaves as a comma-joined string, not array<bigint>:
    # external harnesses canonicalize results via pandas sort_values,
    # which cannot factorize list-typed columns (round-1 driver ERR).
    frames = frame_sample_plan(decoded, n_frames=4).select(
        "media_id", F.array_join("frame_offsets", ",").alias("frame_offsets")
    )
    return resized.join(frames, "media_id")
