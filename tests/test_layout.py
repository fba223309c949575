"""Physical Z-order layout: real parquet-footer file skipping.

x64 models block pruning; these tests measure it from actual file
statistics — the same min/max decision Spark's parquet reader and any
manifest-pruned lakehouse scan makes per file."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from gov_ec_pipeline_etl_spark.operators.layout import (
    file_skip_stats,
    write_zordered,
)
from gov_ec_pipeline_etl_spark.plans.util import T
from tests.conftest import SF_SMOKE


def test_zorder_write_skips_on_both_dimensions(spark, tmp_path):
    """The trailing-dimension predicate is the whole point: on a
    single-key-sorted layout a day-band prunes NOTHING (every file
    spans all days), while the Z-ordered layout prunes a substantial
    fraction — measured from real footers, not modeled blocks. Row
    content is identical either way."""
    orders = T(spark, SF_SMOKE, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
        .cast("long")
        .alias("day"),
    )
    zdir, xdir = str(tmp_path / "z"), str(tmp_path / "x")
    write_zordered(orders, zdir, "o_custkey", "day", n_files=32)
    (
        orders.repartitionByRange(32, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(xdir)
    )

    b = orders.agg(F.max("o_custkey"), F.min("day"), F.max("day")).first()
    maxc, mind, maxd = b
    rect = {
        "o_custkey": (maxc * 0.375, maxc * 0.625),
        "day": (mind + (maxd - mind) * 0.375, mind + (maxd - mind) * 0.625),
    }
    band = {"day": rect["day"]}

    z_rect = file_skip_stats(zdir, rect)
    z_band = file_skip_stats(zdir, band)
    x_rect = file_skip_stats(xdir, rect)
    x_band = file_skip_stats(xdir, band)

    assert z_rect["files_total"] >= 16  # layout actually split into files
    # rectangle: both layouts prune (the leading key carries x-sort)
    assert z_rect["files_skippable"] >= z_rect["files_total"] // 2
    assert x_rect["files_skippable"] >= x_rect["files_total"] // 2
    # day band: single-key sort prunes NOTHING, Z-order prunes plenty
    assert x_band["files_skippable"] == 0
    assert z_band["files_skippable"] >= z_band["files_total"] // 4

    # layout is layout: the data survives byte-for-byte (same multiset)
    a = spark.read.parquet(zdir)
    bdf = spark.read.parquet(xdir)
    assert a.count() == bdf.count()
    assert a.exceptAll(bdf).isEmpty() and bdf.exceptAll(a).isEmpty()
