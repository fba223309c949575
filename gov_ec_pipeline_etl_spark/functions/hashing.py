"""Portable and fast hash families for sketching operators.

Two modes:

- **portable** (default for oracle-checked queries): 60-bit integer from
  the md5 hex prefix — computable bit-identically in Spark
  (``conv(substring(md5(x),1,15),16,10)``) and DuckDB
  (``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``), so MinHash/SimHash
  pipelines are cross-engine deterministic and correctness-gated.
- **fast**: Spark's native ``xxhash64`` — the 100 TB production mode
  (no md5 string round-trip); same operator shapes, engine-local values.

Seeded family: ``h_i(x) = H(i || ':' || x)``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def portable_hash64(col: Column, seed: int = 0) -> Column:
    """60-bit deterministic hash, identical in Spark and DuckDB."""
    salted = F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("bigint")


def portable_hash64_sql(expr: str, seed: int = 0) -> str:
    """DuckDB-side rendering of the same hash (for oracle SQL strings)."""
    return f"CAST('0x' || substr(md5('{seed}:' || {expr}), 1, 15) AS BIGINT)"


def fast_hash64(col: Column, seed: int = 0) -> Column:
    return F.xxhash64(F.lit(seed), col)


def hash64(col: Column, seed: int = 0, portable: bool = True) -> Column:
    return portable_hash64(col, seed) if portable else fast_hash64(col, seed)
