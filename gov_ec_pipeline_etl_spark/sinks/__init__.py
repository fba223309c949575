"""Sinks: idempotent keyed upsert, run-audit ledger, artifact store.

Reference semantics preserved (SURVEY.md §2.13): upsert keyed on
surrogate_id is idempotent; audit writes parent-first; artifact upload
errors are non-fatal; state promotion is commit-gated (orchestrator).
"""

from gov_ec_pipeline_etl_spark.sinks.upsert import upsert_parquet
from gov_ec_pipeline_etl_spark.sinks.audit import AuditLedger
from gov_ec_pipeline_etl_spark.sinks.artifacts import upload_tree
from gov_ec_pipeline_etl_spark.sinks.merge_sql import upsert_dbapi

__all__ = ["AuditLedger", "upload_tree", "upsert_dbapi", "upsert_parquet"]
