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
