"""Streaming semantics: process-each-file-once via checkpoints (the
reference's incremental extraction as Structured Streaming), and
bounded-state streaming dedup."""

from __future__ import annotations

import os

from gov_ec_pipeline_etl_spark.streaming.events import (
    run_incremental_file_stream,
)
from tests.conftest import SF_SMOKE


def test_incremental_file_stream_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    df1 = spark.range(0, 100).withColumnRenamed("id", "v")
    df1.write.mode("append").parquet(src)
    n1 = run_incremental_file_stream(spark, src, ckpt, out)
    assert n1 == 100
    assert spark.read.parquet(out).count() == 100

    # unchanged source → second run processes nothing (reference I2
    # "unchanged ⇒ zero work" as checkpoint semantics)
    n2 = run_incremental_file_stream(spark, src, ckpt, out)
    assert n2 == 0
    assert spark.read.parquet(out).count() == 100

    # new file → processed exactly once, old files not reprocessed
    spark.range(100, 150).withColumnRenamed("id", "v").write.mode(
        "append"
    ).parquet(src)
    n3 = run_incremental_file_stream(spark, src, ckpt, out)
    assert n3 == 50
    assert spark.read.parquet(out).count() == 150


def test_streaming_dedup_halves_planted_duplicates(spark):
    from gov_ec_pipeline_etl_spark.plans.util import T
    from gov_ec_pipeline_etl_spark.streaming.events import run_streaming_dedup

    expected = T(spark, SF_SMOKE, "events").count()
    out = run_streaming_dedup(spark, SF_SMOKE)
    assert out.count() == expected
    assert out.select("event_id").distinct().count() == expected
