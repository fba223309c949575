"""Custom stateful streaming operator via applyInPandasWithState.

The brief's slot for operators Structured Streaming's built-ins can't
express: arbitrary per-key state evolved batch-by-batch in Python.
Example operator: per-user running counters (events seen, value sum,
last-seen timestamp) emitted once per micro-batch per updated key —
the streaming generalization of the reference's per-run audit counters.

State is one pandas-friendly tuple per user — O(keys) state, Arrow
transfer, GroupStateTimeout available for eviction at scale.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from gov_ec_pipeline_etl_spark.plans.util import T

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts_us", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts_us", LongType()),
    ]
)


def _update_user_counters(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last_us = state.get
    else:
        n, total, last_us = 0, 0.0, 0
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        us = pdf["ts"].astype("datetime64[us]").astype("int64")
        last_us = max(last_us, int(us.max()))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [total],
            "last_ts_us": [last_us],
        }
    )


def user_counters_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame → per-user evolving counters."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_counters,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_user_counters(
    spark: SparkSession, sf_dir: str, n_chunks: int = 3
) -> DataFrame:
    """Execute the stateful operator over the events table replayed as
    ``n_chunks`` files (state must survive across micro-batches);
    returns the LAST emitted row per user."""
    staging = os.path.join(
        tempfile.gettempdir(), f"events_state_{uuid.uuid4().hex[:8]}"
    )
    events = T(spark, sf_dir, "events").select("user_id", "ts", "value")
    events.repartition(n_chunks).write.mode("overwrite").parquet(staging)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(staging)
    )
    name = f"counters_{uuid.uuid4().hex[:8]}"
    q = (
        user_counters_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode memory sink appends one row per key per batch → keep the
    # final (cumulative) row per user: the one with max n_events
    all_rows = spark.table(name)
    return (
        all_rows.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("sum_value", "n_events").alias("sum_value_raw"),
            F.max("last_ts_us").alias("last_ts_us"),
        )
        .select(
            "user_id",
            "n_events",
            F.round("sum_value_raw", 2).alias("sum_value"),
            "last_ts_us",
        )
    )
