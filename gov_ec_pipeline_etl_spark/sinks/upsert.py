"""Keyed batch upsert (SURVEY.md §2.13 W2).

The reference upserted row-dicts over HTTP in shrinking batches
(load.py:387-441) — a workaround for a row-oriented REST sink. The
engine-native equivalent is a set-based MERGE:

- **Production path**: Delta Lake ``MERGE INTO target USING updates ON
  target.key = updates.key WHEN MATCHED THEN UPDATE WHEN NOT MATCHED
  THEN INSERT`` — one shuffle on the key, transactional, scales to any
  size. (Delta isn't bundled in this container, so that path is gated.)
- **Bundled path**: merge-by-rewrite on plain parquet — read current
  snapshot, anti-join out matched keys, union the updates, write a new
  snapshot directory, atomically swap a pointer file. Idempotent by
  construction (same input twice → same state), which is the property
  the reference's batching/retry machinery existed to protect.

JDBC targets get the same semantics via staging + ``INSERT … ON
CONFLICT (key) DO UPDATE`` executed by the database.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_POINTER = "_CURRENT"


def _current_snapshot(target_dir: str) -> str | None:
    ptr = os.path.join(target_dir, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr, encoding="utf-8") as f:
        name = json.load(f)["snapshot"]
    path = os.path.join(target_dir, name)
    return path if os.path.exists(path) else None


def read_table(spark: SparkSession, target_dir: str) -> DataFrame | None:
    snap = _current_snapshot(target_dir)
    return spark.read.parquet(snap) if snap else None


def upsert_parquet(
    spark: SparkSession,
    updates: DataFrame,
    target_dir: str,
    key: str = "surrogate_id",
    partition_by: list[str] | None = None,
) -> dict[str, int]:
    """MERGE semantics on a parquet snapshot table. Returns metrics.

    Updates must be unique on ``key`` (the contract dedup guarantees it);
    enforced here defensively with a keep-first dropDuplicates.

    ``partition_by`` mirrors the reference target's index intent
    (date/province composite indexes, sql/010:60-70): partitioning the
    table by e.g. ``ano`` / ``codigo_provincia`` gives Spark static +
    dynamic partition pruning on exactly the predicates those indexes
    served. At 100 TB this is the difference between a full scan and
    reading one partition.
    """
    os.makedirs(target_dir, exist_ok=True)
    updates = updates.dropDuplicates([key])
    current = read_table(spark, target_dir)

    n_updates = updates.count()
    if current is None:
        merged = updates
        n_matched = 0
    else:
        n_matched = (
            current.join(updates.select(key), key, "left_semi").count()
        )
        merged = current.join(
            updates.select(key), key, "left_anti"
        ).unionByName(updates, allowMissingColumns=True)

    snap_name = f"snapshot_{uuid.uuid4().hex[:12]}"
    snap_path = os.path.join(target_dir, snap_name)
    writer = merged.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(snap_path)

    # atomic pointer swap, then GC the old snapshot
    old = _current_snapshot(target_dir)
    tmp = os.path.join(target_dir, f".{_POINTER}.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"snapshot": snap_name}, f)
    os.replace(tmp, os.path.join(target_dir, _POINTER))
    if old and os.path.basename(old) != snap_name:
        shutil.rmtree(old, ignore_errors=True)

    return {
        "rows_upserted": n_updates,
        "rows_matched": n_matched,
        "rows_inserted": n_updates - n_matched,
    }
