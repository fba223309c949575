"""Messy-file ingest: CSV/Excel → Spark DataFrame with header repair.

The reference's header heuristic (SURVEY.md §2.3 P2, etl/transform.py:
76-118) is inherently sample-based: score the first few rows and promote
the best-looking one to header when the current header is mostly
unnamed. That cannot (and should not) live in a Catalyst plan — it runs
at ingest on a driver-side sample, then the full file is read with the
repaired schema.

Excel support is gated on openpyxl (not part of the engine's hard deps);
sheet selection semantics: all purely-numeric sheet names not in the
blacklist, else the first non-blacklisted sheet, else the first sheet
(reference S5, etl/extract.py:240-253).

Scale path: a 100 TB ingest of many files runs this same per-file logic
inside ``mapInPandas`` over a binaryFile listing; the heuristic's code is
identical because it only ever sees one file's head.
"""

from __future__ import annotations

import re
from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from gov_ec_pipeline_etl_spark.functions.text import norm_colname_py

DEFAULT_SHEET_BLACKLIST = ("contenido",)


def _is_numeric_like(v) -> bool:
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return False
    s = str(v).strip()
    return bool(re.fullmatch(r"[+-]?\d+([.,]\d+)?", s))


def _row_header_score(row: pd.Series) -> float:
    """Header-likeness: text cells score up, numeric-looking cells down."""
    str_nonempty = sum(
        1
        for v in row
        if v is not None and not pd.isna(v) and str(v).strip() != ""
        and not _is_numeric_like(v)
    )
    nonnull = sum(1 for v in row if v is not None and not pd.isna(v))
    numeric_like = sum(1 for v in row if _is_numeric_like(v))
    return 2.0 * str_nonempty + nonnull - 0.5 * numeric_like


def _prop_unnamed(columns) -> float:
    if len(columns) == 0:
        return 0.0
    unnamed = sum(
        1
        for c in columns
        if str(c).strip() == "" or str(c).lower().startswith("unnamed")
    )
    return unnamed / len(columns)


def fix_header(pdf: pd.DataFrame, scan_rows: int = 5) -> pd.DataFrame:
    """Promote the best-scoring of the first ``scan_rows`` rows to header
    when the current header looks wrong; drop all-null columns and empty
    unnamed columns; normalize names."""
    if len(pdf) > 0 and _prop_unnamed(pdf.columns) >= 0.5:
        head = pdf.head(scan_rows)
        scores = [_row_header_score(head.iloc[i]) for i in range(len(head))]
        best = max(range(len(scores)), key=lambda i: scores[i]) if scores else 0
        new_names = [
            str(v) if v is not None and not pd.isna(v) else ""
            for v in pdf.iloc[best]
        ]
        pdf = pdf.iloc[best + 1 :].reset_index(drop=True)
        pdf.columns = new_names
    pdf = pdf.dropna(axis=1, how="all")
    keep = [
        c
        for c in pdf.columns
        if str(c).strip() != "" and not str(c).lower().startswith("unnamed")
    ]
    pdf = pdf[keep]
    pdf.columns = [norm_colname_py(c) for c in pdf.columns]
    return pdf


def _to_spark(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    pdf = pdf.astype("object").where(pd.notna(pdf), None)
    if len(pdf.columns) == 0:
        raise ValueError("no usable columns after header repair")
    return spark.createDataFrame(
        [tuple(r) for r in pdf.itertuples(index=False)],
        schema=", ".join(f"`{c}`: string" for c in pdf.columns),
    )


def read_csv_resource(
    spark: SparkSession, path: str, scan_rows: int = 5
) -> DataFrame:
    """Messy CSV resource → header-repaired all-string DataFrame.

    Resource files in the reference's domain are tens of MB, parsed on
    the driver (reference S4) — header repair needs the file head anyway.
    Clean large files should use ``read_csv_distributed``; many messy
    files at scale run ``fix_header`` per-file inside mapInPandas over a
    binaryFile listing."""
    pdf = pd.read_csv(path, dtype=str)
    return _to_spark(spark, fix_header(pdf, scan_rows))


def read_csv_distributed(spark: SparkSession, path: str) -> DataFrame:
    """Clean-header CSV at any size: fully distributed scan, names
    normalized, everything string-typed (coercion is the contract's job)."""
    df = (
        spark.read.option("header", True).option("inferSchema", False).csv(path)
    )
    return df.toDF(*[norm_colname_py(c) for c in df.columns])


def pick_excel_sheets(
    sheet_names: list[str], blacklist: tuple[str, ...] = DEFAULT_SHEET_BLACKLIST
) -> list[str]:
    def norm(s: str) -> str:
        return norm_colname_py(s)

    allowed = [s for s in sheet_names if norm(s) not in blacklist]
    numeric = [s for s in allowed if str(s).strip().isdigit()]
    if numeric:
        return numeric
    if allowed:
        return [allowed[0]]
    return sheet_names[:1]


def _backend_openpyxl(path: str):
    """Primary backend: pandas' openpyxl engine (all cells as strings,
    matching the reference's dtype=str reads, extract.py:276-286)."""
    xl = pd.ExcelFile(path)
    return list(xl.sheet_names), lambda s: xl.parse(s, dtype=str)


def _backend_stdlib(path: str):
    """Fallback backend: bundled stdlib OOXML reader (no third-party
    dependency; shared-strings + inline strings, strings-only cells)."""
    from gov_ec_pipeline_etl_spark.sources import xlsx_lite

    return xlsx_lite.sheet_names(path), lambda s: xlsx_lite.read_sheet(path, s)


def _pick_excel_backend(path: str):
    try:
        import openpyxl  # noqa: F401
    except ImportError:
        return _backend_stdlib(path)
    return _backend_openpyxl(path)


def read_excel_resource(
    spark: SparkSession,
    path: str,
    blacklist: tuple[str, ...] = DEFAULT_SHEET_BLACKLIST,
    scan_rows: int = 5,
) -> DataFrame:
    """Multi-sheet Excel → one DataFrame (sheets unioned by name with
    null-fill, reference U1). Uses pandas+openpyxl when available
    (reference extract.py:276-286 parity), else the bundled stdlib
    OOXML reader (sources/xlsx_lite). Both backends are named functions
    so tests exercise each explicitly (the openpyxl one against a
    pandas-level test double when the library itself is absent)."""
    names, parse = _pick_excel_backend(path)
    sheets = pick_excel_sheets(names, blacklist)
    dfs = [
        _to_spark(spark, fix_header(parse(s), scan_rows)) for s in sheets
    ]
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
    )
