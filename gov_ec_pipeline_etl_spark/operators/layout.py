"""Physical data layout: Z-order clustered writes + footer-stats
file-skipping audit.

x64_zorder_layout MODELS multi-dimensional clustering (blocks touched
per layout). This module makes it physical: ``write_zordered`` writes a
table range-partitioned AND sorted by the Morton key — the layout
``OPTIMIZE ZORDER BY`` produces — and ``file_skip_stats`` reads each
parquet file's FOOTER min/max for the clustered columns and counts how
many files a rectangle predicate can skip. That footer check is
exactly what Spark's parquet reader (and any lakehouse manifest
pruning) does at scan time, so files_skippable/files_total IS the IO
fraction a predicate-bearing scan avoids — measured from real file
statistics, not a model.

Scale shape: the write is one repartitionByRange (range exchange) plus
an in-partition sort — the standard clustering cost, paid once per
maintenance window; the audit is O(files) footer reads, no data scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def morton_key(xb: F.Column, yb: F.Column, bits: int = 8) -> F.Column:
    """Interleave two ``bits``-wide bucket columns into a Morton key —
    pure +/>>/&/<< integer arithmetic inside whole-stage codegen."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        terms.append(
            F.shiftleft(F.shiftright(yb, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 32,
    bits: int = 8,
) -> None:
    """Write ``df`` clustered by the Morton interleave of range-bucketed
    (x_col, y_col): rows near each other in BOTH dimensions land in the
    same files, so per-file min/max statistics become tight rectangles
    instead of full-range strips. The key is dropped before writing —
    it is layout, not payload."""
    bounds = df.agg(
        F.min(x_col).alias("xmin"), F.max(x_col).alias("xmax"),
        F.min(y_col).alias("ymin"), F.max(y_col).alias("ymax"),
    )
    b = df.crossJoin(F.broadcast(bounds))
    span = (1 << bits) - 1
    xb = F.floor(
        (F.col(x_col) - F.col("xmin"))
        * span
        / F.greatest(F.col("xmax") - F.col("xmin"), F.lit(1))
    ).cast("long")
    yb = F.floor(
        (F.col(y_col) - F.col("ymin"))
        * span
        / F.greatest(F.col("ymax") - F.col("ymin"), F.lit(1))
    ).cast("long")
    keyed = b.withColumn("__z", morton_key(xb, yb, bits)).drop(
        "xmin", "xmax", "ymin", "ymax"
    )
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_skip_stats(
    path: str,
    predicates: dict[str, tuple[float, float]],
) -> dict[str, int]:
    """Count parquet files whose FOOTER min/max proves they cannot
    contain rows matching the conjunctive range ``predicates``
    ({col: (lo, hi)} inclusive) — the decision a stats-pruned scan
    makes per file. O(files) footer reads, zero data pages."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet"))) or sorted(
        glob.glob(os.path.join(path, "part-*"))
    )
    total, skippable = 0, 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        total += 1
        overlap = True
        for col, (lo, hi) in predicates.items():
            cmin, cmax = None, None
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        cmin = s.min if cmin is None else min(cmin, s.min)
                        cmax = s.max if cmax is None else max(cmax, s.max)
            if cmin is not None and (cmax < lo or cmin > hi):
                overlap = False
                break
        if not overlap:
            skippable += 1
    return {"files_total": total, "files_skippable": skippable}
