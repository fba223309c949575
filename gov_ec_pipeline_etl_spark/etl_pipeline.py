"""End-to-end ETL orchestrator (reference pipeline.py:40-140 lifecycle,
Spark-native): state → extract (changed resources only) → contract
transform → keyed upsert → audit → commit-gated state promotion.

Library API mirrors the reference's stage contract (SURVEY.md §3.3):
each stage is independently callable with DataFrames in/out.

Failure semantics preserved:
- transform hard-fail aborts before any sink work;
- the audit run opens as 'error' and is only closed 'ok' after the sink
  commit succeeds;
- state is promoted ONLY after a clean sink commit (so a failed run
  reprocesses the same inputs — at-least-once extract + idempotent
  upsert = effectively-once load).
"""

from __future__ import annotations

import datetime as dt
import json
import os
from dataclasses import dataclass, field
from typing import Any, Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from gov_ec_pipeline_etl_spark.contract.compiler import ContractPipeline
from gov_ec_pipeline_etl_spark.contract.loader import load_config
from gov_ec_pipeline_etl_spark.contract.model import Contract
from gov_ec_pipeline_etl_spark.sinks.audit import AuditLedger
from gov_ec_pipeline_etl_spark.sinks.upsert import upsert_parquet
from gov_ec_pipeline_etl_spark.sources.ingest import (
    read_csv_resource,
    read_excel_resource,
)
from gov_ec_pipeline_etl_spark.sources.state import (
    ResourceState,
    diff_resources,
    load_state,
    save_state,
    update_state,
)


@dataclass
class RunResult:
    run_id: str
    status: str
    reports: dict[str, dict[str, Any]] = field(default_factory=dict)
    upsert_metrics: dict[str, dict[str, int]] = field(default_factory=dict)
    skipped_unchanged: list[str] = field(default_factory=list)


def _read_resource(spark: SparkSession, res: dict[str, Any]) -> DataFrame:
    path = res["path"]
    ext = os.path.splitext(path)[1].lower()
    if ext in (".xlsx", ".xls"):
        return read_excel_resource(spark, path)
    return read_csv_resource(spark, path)


def run_etl(
    spark: SparkSession,
    config_path: str,
    resources: list[dict[str, Any]],
    work_dir: str,
    reader: Callable[[SparkSession, dict[str, Any]], DataFrame] | None = None,
) -> RunResult:
    """resources: [{id, path, last_modified, size, url, format}, ...] —
    the already-downloaded catalog view (HTTP cataloging is deployment-
    specific; see sources/state.py for the diff semantics)."""
    contract = Contract.from_dict(load_config(config_path))
    pipeline = ContractPipeline(contract)
    reader = reader or _read_resource

    state_path = os.path.join(work_dir, "state.json")
    target_dir = os.path.join(work_dir, "table", contract.dataset)
    audit = AuditLedger(os.path.join(work_dir, "audit"))

    run_id = dt.datetime.now(dt.timezone.utc).strftime("%Y%m%d_%H%M%S_%f")
    result = RunResult(run_id=run_id, status="error")
    audit.open_run(run_id)

    prev = load_state(state_path) or ResourceState.empty()
    todo, unchanged, reasons = diff_resources(resources, prev)
    result.skipped_unchanged = [r["id"] for r in unchanged]

    pending_state = ResourceState(resources=dict(prev.resources))
    try:
        for res in todo:
            rid = res["id"]
            df = reader(spark, res)
            tr = pipeline.apply(df)  # raises TransformHardFail → run error
            tr.report["change_reasons"] = reasons.get(rid, [])
            result.reports[rid] = tr.report
            # sink projection (FIXTURES.md §B): extras packed to one JSON
            # column, run id stamped on every row
            out = pipeline.pack_extras(tr.df, tr.report["schema_extra"])
            out = out.withColumn("load_run_id", F.lit(run_id))
            metrics = upsert_parquet(
                spark,
                out,
                target_dir,
                key=contract.load_key,
                partition_by=contract.load_partition_by or None,
            )
            result.upsert_metrics[rid] = metrics
            audit.record_resource(run_id, rid, tr.report)
            update_state(pending_state, res)

        # W7/W8: config snapshot + transform report as run artifacts
        art_dir = os.path.join(work_dir, "artifacts", "runs", run_id)
        os.makedirs(art_dir, exist_ok=True)
        with open(
            os.path.join(art_dir, f"{contract.dataset}_config_snapshot.json"),
            "w",
            encoding="utf-8",
        ) as f:
            json.dump(load_config(config_path), f, sort_keys=True, default=str)
        with open(
            os.path.join(art_dir, "transform_report.json"), "w", encoding="utf-8"
        ) as f:
            json.dump(result.reports, f, sort_keys=True, default=str)

        totals = {
            "rows_in_total": sum(r.get("rows_in", 0) for r in result.reports.values()),
            "rows_out_total": sum(r.get("rows_out", 0) for r in result.reports.values()),
            "resources": len(result.reports),
        }
        audit.close_run(run_id, "ok", totals)
        result.status = "ok"
        # commit gate: promote state only after clean sink + audit close
        # (any upsert/transform failure raises before this point), and
        # only when something was actually processed
        if todo or not prev.resources:
            save_state(pending_state, state_path)
    except Exception as e:
        audit.close_run(run_id, "error", error_message=str(e))
        result.status = "error"
        raise
    return result
