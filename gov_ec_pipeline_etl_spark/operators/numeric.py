"""Numeric range rules (SURVEY.md §2.7 M2; etl/transform.py:320-350).

Out-of-bounds values become null (nulls pass through untouched); the
out-of-bounds count is a one-pass conditional aggregate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def bounds_expr(col: Column | str, lo: float | None, hi: float | None) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (c >= F.lit(lo))
    if hi is not None:
        cond = cond & (c <= F.lit(hi))
    # when() passes nulls through: null fails the condition → otherwise(null)
    # which is exactly "keep null as null, oob → null".
    return F.when(cond, c).otherwise(F.lit(None))


def apply_numeric_bounds(
    df: DataFrame, rules: dict[str, tuple[float | None, float | None]]
) -> DataFrame:
    """rules: {column: (lo, hi)} — either bound may be None."""
    return df.select(
        *[
            bounds_expr(c, *rules[c]).alias(c) if c in rules else F.col(c)
            for c in df.columns
        ]
    )


def out_of_bounds_counts(
    df: DataFrame, rules: dict[str, tuple[float | None, float | None]]
) -> dict[str, int]:
    """One aggregate pass over all ruled columns."""
    aggs = []
    for c, (lo, hi) in rules.items():
        col = F.col(c)
        oob = F.lit(False)
        if lo is not None:
            oob = oob | (col < F.lit(lo))
        if hi is not None:
            oob = oob | (col > F.lit(hi))
        aggs.append(F.sum(F.when(oob, 1).otherwise(0)).alias(c))
    row = df.agg(*aggs).first()
    return {c: int(row[c] or 0) for c in rules}
