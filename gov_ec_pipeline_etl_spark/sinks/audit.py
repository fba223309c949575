"""Run-audit ledger (SURVEY.md §2.13 W3, FIXTURES.md §C).

Parent-first protocol preserved from the reference (load.py:472-528):
open the run with status='error' BEFORE any data work (so a crash leaves
an honest record), write per-resource child rows as work completes,
close the run with final status + totals. Stored as JSON-lines on the
driver — audit volume is per-run, not per-row; a cluster deployment
points the same ledger at a Delta/JDBC table.
"""

from __future__ import annotations

import datetime as dt
import json
import os
from typing import Any


def _now_iso() -> str:
    return dt.datetime.now(dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


class AuditLedger:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.runs_path = os.path.join(root, "etl_runs.jsonl")
        self.res_path = os.path.join(root, "etl_run_resources.jsonl")

    def _append(self, path: str, record: dict[str, Any]) -> None:
        with open(path, "a", encoding="utf-8") as f:
            f.write(json.dumps(record, sort_keys=True) + "\n")

    def open_run(self, run_id: str) -> None:
        """Placeholder row, status='error' until closed (crash-honest)."""
        self._append(
            self.runs_path,
            {"run_id": run_id, "started_at": _now_iso(), "status": "error"},
        )

    def record_resource(self, run_id: str, rid: str, report: dict[str, Any]) -> None:
        self._append(
            self.res_path,
            {
                "run_id": run_id,
                "rid": rid,
                "rows_in": report.get("rows_in"),
                "rows_out": report.get("rows_out"),
                "schema_missing": report.get("schema_missing", []),
                "schema_extra": report.get("schema_extra", []),
                "duplicates_business_key": report.get("duplicates_business_key"),
                "dedup_rows_dropped": report.get("dedup_rows_dropped"),
            },
        )

    def close_run(
        self,
        run_id: str,
        status: str,
        totals: dict[str, Any] | None = None,
        error_message: str | None = None,
    ) -> None:
        rec = {
            "run_id": run_id,
            "ended_at": _now_iso(),
            "status": status,
            **(totals or {}),
        }
        if error_message:
            rec["error_message"] = error_message
        self._append(self.runs_path, rec)

    # --- read side (latest record per run wins) -------------------------

    def runs(self) -> dict[str, dict[str, Any]]:
        out: dict[str, dict[str, Any]] = {}
        if not os.path.exists(self.runs_path):
            return out
        with open(self.runs_path, encoding="utf-8") as f:
            for line in f:
                rec = json.loads(line)
                out.setdefault(rec["run_id"], {}).update(rec)
        return out
