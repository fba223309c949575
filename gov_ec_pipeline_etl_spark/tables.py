"""Canonical test-table loaders.

The driver's synthetic star schema (TESTDATA.md): TPC-H-ish tables plus an
``events`` stream table and LLM-pipeline tables ``documents`` /
``embeddings``. One parquet file per table per scale factor.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load the named tables (default: all) as DataFrames.

    Plain ``spark.read.parquet`` — schema comes from parquet footers, and
    Catalyst handles column pruning + predicate pushdown from the lazy plan,
    so there is nothing to pre-filter here.
    """
    return {n: spark.read.parquet(table_path(sf_dir, n)) for n in names or TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the ``spark.sql`` surface."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
