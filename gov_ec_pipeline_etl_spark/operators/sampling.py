"""Corpus sampling for training-data pipelines.

- ``stratified_sample``: per-stratum fractions via ``sampleBy`` — the
  language/source-balancing step of corpus construction. Seeded and
  reproducible within an engine (sampling is engine-specific by nature,
  so these are rows-only at the driver gate; statistical properties are
  unit-tested).
- ``deterministic_hash_sample``: exactly reproducible ACROSS engines and
  runs: keep rows whose portable hash of a key falls under
  ``fraction × 2^32`` — the right tool when a sample must be stable
  under re-runs and engine changes (e.g. held-out eval splits).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from gov_ec_pipeline_etl_spark.functions.hashing import portable_hash64


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    return df.sampleBy(stratum_col, fractions=fractions, seed=seed)


def deterministic_hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Engine-portable deterministic sample: h(key) mod 2^32 < f·2^32.
    Same rows selected in Spark, DuckDB, or any engine with the portable
    hash — membership is a pure function of the key."""
    h32 = portable_hash64(F.col(key_col).cast("string"), seed) % F.lit(2**32)
    return df.where(h32 < F.lit(int(fraction * 2**32)))


BUDGET_SEED = 23
_BUCKET_SHIFT = 50  # 60-bit hash >> 50 → 1024 ordered buckets


def token_budget_take(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    tokens_col: str,
    budget_ppt: int = 600,
    portable: bool = True,
) -> DataFrame:
    """Budget-capped mixture construction: per stratum (source/language),
    keep documents in deterministic hash-priority order while the
    EXCLUSIVE cumulative token count stays under ``budget_ppt``/1000 of
    the stratum's total token mass — how a pretraining mix downsamples
    each source to a token budget instead of a row fraction (rows are
    not tokens: hash-sampling 60% of rows does NOT yield 60% of tokens
    when lengths vary).

    Same scale decomposition as ``stratified_split``: the naive
    spelling is one running-sum window per stratum (a single Spark
    partition per source at 100 TB). Here the cumulative sum is
    hierarchical — bucket = the hash's top bits (bucket order ==
    hash-prefix order), per-(stratum, bucket) token sums roll up to
    broadcastable offsets, and the global exclusive prefix sum is
    offset + the within-bucket running sum. Bit-identical to the
    global-window definition (the oracle's form) because integer sums
    are associative.

    Output: kept rows (id, stratum, toks, cum_before)."""
    from pyspark.sql import Window

    from gov_ec_pipeline_etl_spark.functions.hashing import hash64

    h = hash64(F.col(id_col).cast("string"), BUDGET_SEED, portable)
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(stratum_col).alias("stratum"),
        F.col(tokens_col).cast("long").alias("toks"),
        h.alias("h"),
        F.shiftright(h, _BUCKET_SHIFT).alias("bucket"),
    )
    per_bucket = base.groupBy("stratum", "bucket").agg(
        F.sum("toks").alias("c")
    )
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
        F.sum("c").over(w_tot).alias("total"),
    )
    w_local = (
        Window.partitionBy("stratum", "bucket")
        .orderBy("h", "id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = base.join(F.broadcast(offsets), ["stratum", "bucket"]).select(
        "id",
        "stratum",
        "toks",
        "total",
        (
            F.col("offset")
            + F.coalesce(F.sum("toks").over(w_local), F.lit(0))
        ).alias("cum_before"),
    )
    return cum.where(
        F.col("cum_before") * 1000 < F.col("total") * budget_ppt
    ).select("id", "stratum", "toks", "cum_before")
