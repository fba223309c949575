"""Stored incremental-aggregate maintenance (the operable form of u56).

u56 proves the additive-IVM identity in-query: agg(base) ⊕ agg(delta)
== agg(base ∪ delta), integer-exactly, for the self-maintainable
aggregates (COUNT / SUM over integer-cast measures). This module
deploys it as a STORE a user can operate (the same "operator exists →
a user can run it" contract as the stored dedup/ANN indexes):

    init_store(spark, base_df, store, keys=[...], sums={...})
    apply_delta(spark, delta_df, store, batch_id="2026-08-15")
    verify_store(spark, full_df, store)          # == recompute?

Layout — versioned snapshots with an atomically-swapped pointer (the
upsert sink's promote discipline, simplified: one writer assumed):

    store/
      v000001/part-*.parquet      agg cells for snapshot 1
      v000002/...
      _meta.json                  {keys, sums, current, applied: [...]}

``apply_delta`` is IDEMPOTENT per batch_id: the meta ledger records
applied ids, and a replayed batch is a recorded no-op — the property
that makes at-least-once delivery safe, exactly as the keyed upsert
sink's run ledger does for row merges. Nothing here scans the base
data after init: each apply aggregates ONLY the delta (cells-sized
shuffle), merges against the current cells-sized snapshot, and writes
a new snapshot — the 100 TB posture is delta-sized work per refresh.

At cluster scale the snapshot write is a cells-sized parquet (group
cardinality, not fact cardinality), so versioning cost is bounded by
the dimensionality of the view, never the corpus.
"""

from __future__ import annotations

import json
import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_META = "_meta.json"


def _meta_path(store: str) -> str:
    return os.path.join(store, _META)


def _read_meta(store: str) -> dict:
    with open(_meta_path(store), encoding="utf-8") as f:
        return json.load(f)


def _write_meta(store: str, meta: dict) -> None:
    # tmp + replace: readers never observe a torn pointer
    fd, tmp = tempfile.mkstemp(dir=store, suffix=".tmp")
    with os.fdopen(fd, "w", encoding="utf-8") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
    os.replace(tmp, _meta_path(store))


def _agg(df: DataFrame, keys: list[str], sums: dict[str, str]) -> DataFrame:
    """COUNT + integer-cast SUMs — the self-maintainable aggregates.
    ``sums`` maps output name -> source column; sources are cast to
    bigint BEFORE summing so ⊕ is exact integer algebra (callers
    pre-scale money to cents etc.)."""
    measures = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.col(src).cast("bigint")).alias(name)
        for name, src in sums.items()
    ]
    return df.groupBy(*keys).agg(*measures)


def _snapshot_dir(store: str, version: int) -> str:
    return os.path.join(store, f"v{version:06d}")


def init_store(
    spark: SparkSession,
    base_df: DataFrame,
    store: str,
    keys: list[str],
    sums: dict[str, str],
) -> dict:
    """Aggregate ``base_df`` and write snapshot v1 + meta."""
    os.makedirs(store, exist_ok=True)
    _agg(base_df, keys, sums).write.mode("overwrite").parquet(
        _snapshot_dir(store, 1)
    )
    meta = {"keys": keys, "sums": sums, "current": 1, "applied": []}
    _write_meta(store, meta)
    return meta


def read_store(spark: SparkSession, store: str) -> DataFrame:
    meta = _read_meta(store)
    return spark.read.parquet(_snapshot_dir(store, meta["current"]))


def apply_delta(
    spark: SparkSession, delta_df: DataFrame, store: str, batch_id: str
) -> dict:
    """Merge ``delta_df``'s aggregate into a NEW snapshot and promote
    it. Idempotent per ``batch_id``: a replay is a recorded no-op."""
    meta = _read_meta(store)
    if batch_id in meta["applied"]:
        return {**meta, "replayed": batch_id}
    keys, sums = meta["keys"], meta["sums"]
    cur = read_store(spark, store)
    d = _agg(delta_df, keys, sums)
    measure_cols = ["n_rows", *sums]
    z = F.lit(0).cast("bigint")
    merged = cur.alias("a").join(
        d.alias("b"), keys, "full_outer"
    ).select(
        *[F.col(k) for k in keys],
        *[
            (
                F.coalesce(F.col(f"a.{m}"), z) + F.coalesce(F.col(f"b.{m}"), z)
            ).alias(m)
            for m in measure_cols
        ],
    )
    nxt = meta["current"] + 1
    merged.write.mode("overwrite").parquet(_snapshot_dir(store, nxt))
    meta = {
        **meta,
        "current": nxt,
        "applied": [*meta["applied"], batch_id],
    }
    _write_meta(store, meta)
    return meta


def verify_store(
    spark: SparkSession, full_df: DataFrame, store: str
) -> dict:
    """Recompute the view from ``full_df`` and diff cell-for-cell
    against the current snapshot (integer equality, both directions)."""
    meta = _read_meta(store)
    keys, sums = meta["keys"], meta["sums"]
    measure_cols = ["n_rows", *sums]
    cur = read_store(spark, store)
    ref = _agg(full_df, keys, sums)
    joined = cur.alias("a").join(ref.alias("b"), keys, "full_outer")
    mismatch = joined.where(
        " OR ".join(
            f"NOT (a.{m} <=> b.{m})" for m in measure_cols
        )
    ).count()
    return {
        "cells": ref.count(),
        "mismatched_cells": mismatch,
        "ok": mismatch == 0,
        "current": meta["current"],
        "applied": meta["applied"],
    }
