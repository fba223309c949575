"""The engine's declared query surface.

Every operator the engine claims (SURVEY.md §2 plus the LLM-pipeline
extensions) is exposed here as a named query: a Spark callable
``(spark, sf_dir) -> DataFrame`` paired, wherever SQL can express the
semantics, with an ANSI-SQL oracle string the driver runs on DuckDB.

Column names are aliased identically on both sides — the driver's compare
sorts columns by name before hashing values.
"""

from gov_ec_pipeline_etl_spark.plans.registry import Query, all_queries, register

__all__ = ["Query", "all_queries", "register"]
