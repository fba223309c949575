"""Skew mitigation: salted two-phase aggregation and salted broadcast
fan-out joins.

AQE's skew-join splitting handles most cases at runtime; these explicit
forms cover the residue: a single hot key inside a hash AGGREGATION
(AQE cannot split a hash-agg partition mid-group) and replicated
broadcast joins where one build-side key dominates.

Both are pure plan rewrites with identical semantics to the unsalted
form — which is exactly what the oracle-checked q34 demonstrates.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

SALT_COL = "__salt"


def salted_two_phase_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: Callable[[], list[Column]],
    final_aggs: Callable[[], list[Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """groupBy(keys) rewritten as groupBy(keys, salt) → groupBy(keys).

    ``partial_aggs`` produce per-(key,salt) partials; ``final_aggs``
    combine partials (e.g. partial SUM/COUNT → final SUM of sums,
    SUM of counts). A hot key's rows now spread over ``salt_buckets``
    reducers in phase 1; phase 2 touches only #keys×buckets rows.
    """
    salted = df.withColumn(
        SALT_COL, (F.rand(seed=7) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, SALT_COL).agg(*partial_aggs())
    return partial.groupBy(*keys).agg(*final_aggs())


def replicate_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Inner equi-join where ``small`` broadcasts: salt the big side and
    replicate the small side across salt values so a hot key's rows land
    on ``salt_buckets`` different tasks instead of one."""
    salted_big = big.withColumn(
        SALT_COL, (F.rand(seed=11) * salt_buckets).cast("int")
    )
    replicated_small = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(salt_buckets).select(
                F.col("id").cast("int").alias(SALT_COL)
            )
        )
    )
    return salted_big.join(
        F.broadcast(replicated_small), on=[key, SALT_COL]
    ).drop(SALT_COL)
