"""Deterministic key generation (SURVEY.md §2.9).

- ``business_key``: pipe-joined null-tolerant concat of key fields
  (reference K1, etl/transform.py:356-365). String rendering matters for
  hash parity: integers render without decimal point, timestamps as
  'yyyy-MM-dd HH:mm:ss' — both matching the reference's pandas rendering.
- ``surrogate_sha256``: hex sha256 of the seed (K5) — native F.sha2.
- ``surrogate_uuid5``: RFC-4122 v5 (K4) — pandas UDF wrapping uuid.uuid5,
  bit-exact with CPython's uuid module so upserts stay idempotent across
  engines.
"""

from __future__ import annotations

import uuid

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.types import StringType, TimestampType


def _render(col: Column, dtype=None) -> Column:
    """Render a key component as text the way pandas `astype(str)` does."""
    if isinstance(dtype, TimestampType):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return col.cast("string")


def business_key(df, fields: list[str], sep: str = "|") -> Column:
    """Null components render as '' ; fields missing from the schema
    contribute '' for every row (reference semantics)."""
    parts = []
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    for name in fields:
        if name in dtypes:
            parts.append(F.coalesce(_render(F.col(name), dtypes[name]), F.lit("")))
        else:
            parts.append(F.lit(""))
    return F.concat_ws(sep, *parts)


def surrogate_sha256(seed: Column) -> Column:
    return F.sha2(seed, 256)


def uuid5_py(namespace: str, seed: str) -> str:
    return str(uuid.uuid5(uuid.uuid5(uuid.NAMESPACE_URL, namespace), seed))


def surrogate_uuid5(seed: Column, namespace: str) -> Column:
    """Deterministic uuid5(uuid5(NAMESPACE_URL, namespace), seed)."""
    ns_uuid = uuid.uuid5(uuid.NAMESPACE_URL, namespace)

    @F.pandas_udf(StringType())
    def _uuid5(s: pd.Series) -> pd.Series:
        return s.map(lambda v: str(uuid.uuid5(ns_uuid, v)) if v is not None else None)

    return _uuid5(seed)
