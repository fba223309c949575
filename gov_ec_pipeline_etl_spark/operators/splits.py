"""Deterministic stratified train/val/test splits.

A pretraining pipeline needs held-out splits that are (a) reproducible
run-to-run and cluster-to-cluster, (b) exactly proportional per stratum
(per source/language/domain — Bernoulli hash sampling drifts by
±O(√n)), and (c) computable without a global sort.

The rule: within each stratum, order documents by a portable 60-bit
hash of their id (tie-break: the id), take the 0-based rank r against
the stratum size n, and assign by integer thresholds
``r·1000 < n·train_ppt`` → train, ``< n·(train+val)`` → val, else test.
Exact counts, no RNG state, stable under re-runs.

Scale: the naive spelling is one window over each stratum — a single
Spark partition per stratum, which dies on a 10¹⁰-row source. Instead
the rank is computed hierarchically: bucket = the hash's TOP bits
(bucket order == hash-prefix order), per-(stratum, bucket) counts roll
up to broadcastable cumulative offsets, and the global rank is
offset + the within-bucket row_number. Window partitions shrink by the
bucket fan-out (1024×) while the assignment stays bit-identical to the
global-window definition — which is exactly what the DuckDB oracle
runs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from gov_ec_pipeline_etl_spark.functions.hashing import hash64, portable_hash64_sql

SPLIT_SEED = 17
BUCKET_SHIFT = 50  # 60-bit hash >> 50 → 1024 ordered buckets


def stratified_split(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    train_ppt: int = 800,
    val_ppt: int = 100,
    portable: bool = True,
) -> DataFrame:
    """(id, stratum, split) with exact per-stratum proportions.

    ``train_ppt``/``val_ppt`` are parts-per-thousand; the remainder is
    test. Assignment is a pure function of (id, stratum membership
    counts) — appending documents to OTHER strata never reassigns a
    row, and re-running on identical data is bit-identical.
    """
    h = hash64(F.col(id_col).cast("string"), SPLIT_SEED, portable)
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(stratum_col).alias("stratum"),
        h.alias("h"),
        F.shiftright(h, BUCKET_SHIFT).alias("bucket"),
    )
    per_bucket = base.groupBy("stratum", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    # strata × ≤1024 rows: cumulative offsets + stratum totals are tiny
    w_cum = (
        Window.partitionBy("stratum")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy("stratum")
    offsets = per_bucket.select(
        "stratum",
        "bucket",
        F.coalesce(F.sum("c").over(w_cum), F.lit(0)).alias("offset"),
        F.sum("c").over(w_tot).alias("n"),
    )
    w_rank = Window.partitionBy("stratum", "bucket").orderBy("h", "id")
    ranked = base.join(F.broadcast(offsets), ["stratum", "bucket"]).select(
        "id",
        "stratum",
        (F.col("offset") + F.row_number().over(w_rank) - 1).alias("rnk"),
        "n",
    )
    r1000 = F.col("rnk") * 1000
    return ranked.select(
        "id",
        "stratum",
        F.when(r1000 < F.col("n") * train_ppt, F.lit("train"))
        .when(r1000 < F.col("n") * (train_ppt + val_ppt), F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def stratified_split_sql(
    relation_sql: str,
    id_expr: str,
    stratum_expr: str,
    train_ppt: int = 800,
    val_ppt: int = 100,
) -> str:
    """DuckDB rendering of the SAME assignment via the global-window
    definition (rank over ORDER BY h, id per stratum) — equal to the
    bucketed engine formulation because the bucket is the hash's prefix."""
    h = portable_hash64_sql(f"CAST({id_expr} AS VARCHAR)", SPLIT_SEED)
    return f"""
        SELECT id, stratum,
               CASE WHEN rnk * 1000 < n * {train_ppt} THEN 'train'
                    WHEN rnk * 1000 < n * {train_ppt + val_ppt} THEN 'val'
                    ELSE 'test' END AS split
        FROM (
          SELECT {id_expr} AS id, {stratum_expr} AS stratum,
                 ROW_NUMBER() OVER (
                   PARTITION BY {stratum_expr} ORDER BY {h}, {id_expr}
                 ) - 1 AS rnk,
                 COUNT(*) OVER (PARTITION BY {stratum_expr}) AS n
          FROM ({relation_sql})
        )
    """
