"""Shared helpers for query plans."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from gov_ec_pipeline_etl_spark.tables import read_table, table_path


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one canonical table lazily (column pruning / predicate pushdown
    flow from the final plan, so no eager projection here)."""
    if name == "events":
        return _read_events(spark, sf_dir)
    return read_table(spark, sf_dir, name)


def _read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical events.parquet generations stored INT64 TIMESTAMP(NANOS),
    which Spark 4 rejects by default; current generations store naive
    TIMESTAMP(MICROS), normalized by ``read_table``. Keep the nanos branch
    so the engine reads either generation: nanos read as long, converted
    with integer division (`div`, not `/` — double division loses precision
    at 1e18 ns) to a microsecond timestamp, matching DuckDB's nanos→micros
    truncation.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = read_table(spark, sf_dir, "events")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
