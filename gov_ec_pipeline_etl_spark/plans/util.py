"""Shared helpers for query plans."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from gov_ec_pipeline_etl_spark.tables import table_path


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one canonical table lazily (column pruning / predicate pushdown
    flow from the final plan, so no eager projection here)."""
    if name == "events":
        return _read_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def _read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores INT64 TIMESTAMP(NANOS), which Spark 4 rejects
    by default. Read nanos as long, then convert with integer division
    (`div`, not `/` — double division loses precision at 1e18 ns) to a
    microsecond timestamp, matching DuckDB's nanos→micros truncation.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The raw nanos are naive wall-clock (isAdjustedToUTC=false); pinning
    # the session to UTC makes every downstream date_trunc/window render
    # them as stored, matching DuckDB's naive TIMESTAMP reading even if
    # the host JVM runs in another timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
