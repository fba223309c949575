"""Unit tests for engine scalar functions: bit-exactness of uuid5,
accent-strip/normalize parity with the pure-Python oracles, key
rendering semantics."""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gov_ec_pipeline_etl_spark.functions.ids import (
    business_key,
    surrogate_sha256,
    surrogate_uuid5,
    uuid5_py,
)
from gov_ec_pipeline_etl_spark.functions.text import (
    norm_colname_py,
    norm_text,
    norm_text_py,
    strip_accents,
    strip_accents_py,
)


# --- pure-Python properties (no Spark needed) ---------------------------


@given(st.text(max_size=80))
@settings(max_examples=200, deadline=None)
def test_norm_text_idempotent(s):
    once = norm_text_py(s)
    assert norm_text_py(once) == once


@given(st.text(max_size=80))
@settings(max_examples=200, deadline=None)
def test_strip_accents_ascii_fixpoint(s):
    out = strip_accents_py(s)
    assert strip_accents_py(out) == out


def test_strip_accents_examples():
    assert strip_accents_py("café niño ÁÉÍ") == "cafe nino AEI"
    assert strip_accents_py(None) is None


def test_norm_colname_examples():
    assert norm_colname_py("  Fecha Detención/Aprehensión ") == (
        "fecha_detencion_aprehension"
    )
    assert norm_colname_py("Código__ICCS") == "codigo_iccs"
    assert norm_colname_py("__x__") == "x"


def test_uuid5_matches_stdlib():
    ns = uuid.uuid5(uuid.NAMESPACE_URL, "detenidos")
    assert uuid5_py("detenidos", "a|b|c") == str(uuid.uuid5(ns, "a|b|c"))


# --- Spark-side parity ---------------------------------------------------


def test_spark_udfs_match_python(spark):
    samples = ["café", "  Ñandú  grande ", "ASCII only", "", "á", None]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    rows = df.select(
        strip_accents(F.col("s")).alias("stripped"),
        norm_text(F.col("s")).alias("normed"),
    ).collect()
    for s, r in zip(samples, rows):
        assert r.stripped == strip_accents_py(s)
        assert r.normed == norm_text_py(s)


def test_spark_uuid5_bit_exact(spark):
    df = spark.createDataFrame([("a|b|c",), ("x|y|z",), (None,)], ["seed"])
    rows = df.select(
        surrogate_uuid5(F.col("seed"), "detenidos").alias("u")
    ).collect()
    assert rows[0].u == uuid5_py("detenidos", "a|b|c")
    assert rows[1].u == uuid5_py("detenidos", "x|y|z")
    assert rows[2].u is None


def test_business_key_semantics(spark):
    import datetime

    df = spark.createDataFrame(
        [(1, None, "x", datetime.datetime(2024, 1, 2, 3, 4, 5))],
        "a: bigint, b: string, c: string, ts: timestamp",
    )
    row = df.select(
        business_key(df, ["a", "b", "c", "ts", "missing_col"]).alias("bk")
    ).first()
    # null → '', missing column → '', timestamp pandas-style rendering
    assert row.bk == "1||x|2024-01-02 03:04:05|"


def test_surrogate_sha256(spark):
    import hashlib

    df = spark.createDataFrame([("k1",)], ["bk"])
    row = df.select(surrogate_sha256(F.col("bk")).alias("s")).first()
    assert row.s == hashlib.sha256(b"k1").hexdigest()
