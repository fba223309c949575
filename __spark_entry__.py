"""Driver contract for the spark-graft builder (PySpark target).

Exposes the engine's declared query surface
(``gov_ec_pipeline_etl_spark.plans``): each entry pairs a Spark
DataFrame plan with a DuckDB-runnable ANSI-SQL oracle (column names
aliased identically on both sides).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gov_ec_pipeline_etl_spark.plans import all_queries  # noqa: E402
from gov_ec_pipeline_etl_spark.plans.registry import oracle_text  # noqa: E402

# The driver runs the correctness gate at sf0.01; lazy oracles (SQL with
# data-derived golden literals) are resolved against that scale factor.
DRIVER_SF_DIR = "/root/testdata/sf0.01"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    from gov_ec_pipeline_etl_spark.plans.relational import q01_pricing_summary

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark for name, q in sorted(all_queries().items())}


def oracle_sql() -> dict[str, str]:
    return {
        name: oracle_text(q, DRIVER_SF_DIR)
        for name, q in sorted(all_queries().items())
        if q.oracle is not None
    }
