"""Text normalization functions.

Reproduces the reference's normalization semantics (SURVEY.md §2.5:
accent-strip T1, null-safe text-normalize T2, column-name normalize P1 —
etl/transform.py:49-74) as engine functions. The accent strip is the one
string operation with no Spark builtin, so it is an Arrow-batched pandas
UDF; the rest is builtin composition (JVM-side, codegen-friendly).
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.types import StringType


# --- pure-Python versions (driver-side use + oracles for the UDFs) -------


def strip_accents_py(s: str | None) -> str | None:
    """NFKD-decompose and drop combining marks ('café' → 'cafe')."""
    if s is None:
        return None
    return "".join(
        ch for ch in unicodedata.normalize("NFKD", s) if not unicodedata.combining(ch)
    )


def norm_text_py(s: str | None) -> str | None:
    """Null-safe: accent-strip → lower → collapse whitespace → strip.
    Trimming happens AFTER accent-stripping because NFKD can introduce
    whitespace (e.g. '¨' → space + combining diaeresis) — this order makes
    the function idempotent."""
    if s is None:
        return None
    s = strip_accents_py(s).lower()
    return re.sub(r"\s+", " ", s).strip()


def norm_colname_py(name: str) -> str:
    """Column-name canonicalization: accent-strip → lower → non-alnum runs
    to '_' → collapse '_' → trim '_'."""
    s = strip_accents_py(str(name).strip()).lower()
    s = re.sub(r"[^a-z0-9_]+", "_", s)
    s = re.sub(r"_+", "_", s)
    return s.strip("_")


# --- Spark-side versions -------------------------------------------------


@F.pandas_udf(StringType())
def _strip_accents_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: strip_accents_py(v) if v is not None else None)


def strip_accents(col: Column | str) -> Column:
    """Accent-strip a string column (pandas UDF — no Spark builtin)."""
    return _strip_accents_udf(F.col(col) if isinstance(col, str) else col)


def norm_text(col: Column | str) -> Column:
    """Spark composition mirroring norm_text_py: accent-strip → lower →
    collapse whitespace → trim. Null-safe throughout."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(strip_accents(c)), r"\s+", " "))


def norm_text_ascii(col: Column | str) -> Column:
    """Accent-free fast path of norm_text: pure builtins, fully
    codegen'd — use when input is known 7-bit (e.g. synthetic corpora)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def norm_colname(name: str) -> str:
    """Driver-side only: schema names live on the driver."""
    return norm_colname_py(name)
