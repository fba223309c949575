"""Structured JSON-lines run logging (reference O5/S8 semantics:
etl/log.py:29-87, etl/upload_log.py:57-107).

- ``JsonlLogger``: stdout + rotating file (2 MB × 3 backups), one JSON
  object per line with ``time/level/name/message`` plus extras.
- ``read_log_df``: log file → DataFrame; invalid JSON lines survive as
  ``{"raw": line}`` records (corrupt-record fallback), ready for a
  ``write.jdbc``/Delta append as the log-shipping path.
"""

from __future__ import annotations

import datetime as dt
import json
import logging
import logging.handlers
import os
import sys
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

LOG_SCHEMA = "time string, level string, name string, message string, extras string, raw string"


class JsonlFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        payload: dict[str, Any] = {
            "time": dt.datetime.now(dt.timezone.utc).strftime(
                "%Y-%m-%dT%H:%M:%S.%fZ"
            ),
            "level": record.levelname,
            "name": record.name,
            "message": record.getMessage(),
        }
        if isinstance(record.args, dict):
            payload.update(record.args)
        return json.dumps(payload, sort_keys=True, default=str)


def get_logger(
    name: str,
    log_file: str | None = None,
    max_bytes: int = 2 * 1024 * 1024,
    backups: int = 3,
) -> logging.Logger:
    logger = logging.getLogger(name)
    if getattr(logger, "_jsonl_configured", False):
        return logger
    logger.setLevel(logging.INFO)
    logger.propagate = False
    fmt = JsonlFormatter()
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        fh = logging.handlers.RotatingFileHandler(
            log_file, maxBytes=max_bytes, backupCount=backups
        )
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger._jsonl_configured = True  # type: ignore[attr-defined]
    return logger


def read_log_df(spark: SparkSession, path: str) -> DataFrame:
    """JSONL log → DataFrame with corrupt-line fallback. Driver-side line
    parse mirrors the reference exactly (invalid JSON → {'raw': line});
    log volumes are per-run, not per-row."""
    rows = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            try:
                rec = json.loads(line)
                if not isinstance(rec, dict):
                    raise ValueError
            except ValueError:
                rows.append((None, None, None, None, None, line))
                continue
            known = {k: rec.pop(k, None) for k in ("time", "level", "name", "message")}
            rows.append(
                (
                    known["time"],
                    known["level"],
                    known["name"],
                    known["message"],
                    json.dumps(rec, sort_keys=True) if rec else None,
                    None,
                )
            )
    return spark.createDataFrame(rows, LOG_SCHEMA)


def ship_log(
    spark: SparkSession, path: str, target_dir: str, chunk_partitions: int = 1
) -> int:
    """Append the parsed log to a parquet target (JDBC/Delta in a
    deployment). Returns row count."""
    df = read_log_df(spark, path)
    n = df.count()
    df.repartition(chunk_partitions).withColumn(
        "shipped_at", F.current_timestamp()
    ).write.mode("append").parquet(target_dir)
    return n
