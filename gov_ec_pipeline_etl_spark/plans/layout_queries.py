"""Layout / sampling / trend queries (u58, u59, x64).

Three capabilities rounding out the engine's warehouse surface:

- **u58** is deterministic weighted sampling without replacement
  (Efraimidis & Spirakis 2006, "A-Res"): each row draws a uniform
  u from the portable hash and survives by the order statistic
  u^(1/w) — here compared in the equivalent monotone form ln(u)/w.
  The k winners are provably a weight-proportional sample, and the
  hash-derived u makes the draw reproducible across engines and
  re-runs (the property a 100 TB curation pipeline actually needs:
  re-running the sample job must not reshuffle the corpus).
- **u59** is grouped OLS trend regression (slope / intercept / R²
  of daily event volume per event type) computed from ONE pass of
  integer moment sums (n, Σx, Σy, Σxy, Σx², Σy²) — the classic
  map-side-combinable form: every moment is an integer-exact bigint
  until the final division, so 1000 executors can partial-aggregate
  freely. (At extreme counts Σy² wants DECIMAL(38) — documented
  swap-in, same shape.)
- **x64** demonstrates multi-dimensional data layout: a Z-order
  (Morton) interleave of range-bucketed (customer, order-day)
  coordinates, the clustering key behind Delta/Iceberg
  ``OPTIMIZE ZORDER BY``. For a rectangle predicate covering 1/16
  of the key space it counts how many 1024-block units each layout
  touches — Z-order vs customer-lexicographic vs hash — which IS
  the file-skipping IO ratio a min/max-pruned scan achieves at
  100 TB. Pure integer bit math end-to-end, fully oracled.

Reference parity note: the pandas reference (dfevx/gov-ec-pipeline-etl)
has no sampling/regression/layout surface; these extend the engine's
training-data-pipeline tier (SURVEY §2 "beyond the reference").
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from gov_ec_pipeline_etl_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_sql,
)
from gov_ec_pipeline_etl_spark.plans.registry import register
from gov_ec_pipeline_etl_spark.plans.util import T

# ---------------------------------------------------------------------------
# u58: weighted sampling without replacement (Efraimidis–Spirakis A-Res)
# ---------------------------------------------------------------------------

_U58_K = 200
_U58_GRID = 1_000_000  # uniform draw resolution: u = (h % G + 0.5) / G

_U58_ORACLE = f"""
    WITH keyed AS (
      SELECT doc_id,
             CAST(GREATEST(n_chars, 1) AS BIGINT) AS w,
             ROUND(
               ln((({portable_hash64_sql("CAST(doc_id AS VARCHAR)", seed=58)}
                     % {_U58_GRID}) + 0.5) / {_U58_GRID}.0)
               / GREATEST(n_chars, 1), 6) AS k6
      FROM documents
    ),
    top AS (
      SELECT doc_id, w, k6
      FROM keyed ORDER BY k6 DESC, doc_id LIMIT {_U58_K}
    )
    SELECT doc_id, w, k6,
           CAST(ROW_NUMBER() OVER (ORDER BY k6 DESC, doc_id) AS BIGINT)
             AS sel_rank
    FROM top
"""


@register(
    "u58_weighted_sample",
    oracle=_U58_ORACLE,
    doc="Deterministic weighted sampling without replacement "
    "(Efraimidis–Spirakis 2006 A-Res): key = ln(u)/w with u drawn from "
    "the portable hash on a 1e6 grid and w = character mass, keep the "
    "global top-k keys. Cross-engine float discipline: the only libm "
    "call is ln() on a shared double grid, quantized at 6dp with a "
    "doc_id tiebreak before any ordering decision (u32's rule). The "
    "top-k is a distributed TakeOrdered — no global sort materializes "
    "— and the rank window runs on the k survivors only. Deterministic "
    "u means the sample is reproducible run-over-run at any scale.",
    bench=True,
    tags=("sampling", "weighted", "curation"),
)
def u58_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    w = F.greatest(F.col("n_chars"), F.lit(1)).cast("bigint")
    u = (
        (portable_hash64(F.col("doc_id").cast("string"), seed=58) % _U58_GRID)
        + F.lit(0.5)
    ) / F.lit(float(_U58_GRID))
    keyed = docs.select(
        "doc_id",
        w.alias("w"),
        F.round(F.log(u) / w, 6).alias("k6"),
    )
    top = keyed.orderBy(F.desc("k6"), F.asc("doc_id")).limit(_U58_K)
    rank_w = Window.orderBy(F.desc("k6"), F.asc("doc_id"))
    return top.withColumn(
        "sel_rank", F.row_number().over(rank_w).cast("bigint")
    )


# ---------------------------------------------------------------------------
# u59: grouped OLS trend regression from one pass of integer moments
# ---------------------------------------------------------------------------

_U59_ORACLE = """
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events
      GROUP BY 1, 2
    ),
    mom AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM daily GROUP BY 1
    )
    SELECT event_type, n AS n_days,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0), 6)
             AS slope,
           ROUND(CAST(sy * sxx - sx * sxy AS DOUBLE)
                 / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0), 6)
             AS intercept,
           CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0
                THEN NULL
                ELSE ROUND(
                  (CAST(n * sxy - sx * sy AS DOUBLE)
                   * CAST(n * sxy - sx * sy AS DOUBLE))
                  / (CAST(n * sxx - sx * sx AS DOUBLE)
                     * CAST(n * syy - sy * sy AS DOUBLE)), 6)
           END AS r2
    FROM mom
"""


@register(
    "u59_trend_regression",
    oracle=_U59_ORACLE,
    doc="Per-event-type OLS trend of daily volume: slope / intercept / "
    "R² derived from integer moment sums (n, Σx, Σy, Σxy, Σx², Σy²). "
    "Every moment is an exact bigint — partial-aggregatable map-side, "
    "so the corpus-scale work is the one (event_type, day) shuffle; the "
    "moments row per type is driver-scale. The closed forms divide "
    "integer-exact numerators once and 6dp-round — no accumulation-"
    "order float drift is possible. Degenerate groups (one day, or "
    "constant volume) yield NULL by guard, not NaN. At extreme daily "
    "counts Σy² wants DECIMAL(38,0); same plan shape.",
    tags=("regression", "trend", "aggregation"),
)
def u59_trend_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
            .cast("bigint")
            .alias("x"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    mom = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    inum = F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    return mom.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round(
            num.cast("double") / F.nullif(denx.cast("double"), F.lit(0.0)), 6
        ).alias("slope"),
        F.round(
            inum.cast("double") / F.nullif(denx.cast("double"), F.lit(0.0)), 6
        ).alias("intercept"),
        F.when((denx == 0) | (deny == 0), F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (num.cast("double") * num.cast("double"))
                / (denx.cast("double") * deny.cast("double")),
                6,
            )
        )
        .alias("r2"),
    )


# ---------------------------------------------------------------------------
# x64: Z-order layout clustering vs lexicographic vs hash
# ---------------------------------------------------------------------------

def _morton_sql(xb: str, yb: str) -> str:
    """16-bit Morton interleave of two 8-bit bucket expressions as pure
    +/>>/&/<< integer arithmetic — identical semantics in Spark SQL and
    DuckDB (both operate on BIGINT two's complement; inputs are 0..255)."""
    terms = []
    for i in range(8):
        terms.append(f"((({xb} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({yb} >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


_X64_RECT = "xb BETWEEN 64 AND 127 AND yb BETWEEN 64 AND 127"
_X64_YBAND = "yb BETWEEN 64 AND 127"


def _x64_oracle(sf_dir: str) -> str:
    z = _morton_sql("xb", "yb")
    h1024 = portable_hash64_sql("CAST(o_orderkey AS VARCHAR)", seed=64)
    return f"""
    WITH b AS (
      SELECT CAST(MAX(o_custkey) AS BIGINT) AS maxc,
             CAST(MIN(date_diff('day', DATE '1970-01-01',
                                CAST(o_orderdate AS DATE))) AS BIGINT) AS mind,
             CAST(MAX(date_diff('day', DATE '1970-01-01',
                                CAST(o_orderdate AS DATE))) AS BIGINT) AS maxd
      FROM orders
    ),
    coords AS (
      SELECT ((o_custkey - 1) * 256) // maxc AS xb,
             ((date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               - mind) * 256) // (maxd - mind + 1) AS yb,
             ((o_custkey - 1) * 1024) // maxc AS lexblock,
             o_orderkey
      FROM orders, b
    ),
    blocks AS (
      SELECT {z} // 64 AS zblock,
             lexblock,
             ({h1024} % 1024) AS hashblock,
             ({_X64_RECT}) AS rect,
             ({_X64_YBAND}) AS yband
      FROM coords
    )
    SELECT CAST(COUNT(DISTINCT zblock) AS BIGINT) AS blocks_z_total,
           CAST(COUNT(DISTINCT CASE WHEN rect THEN zblock END) AS BIGINT)
             AS rect_z_touched,
           CAST(COUNT(DISTINCT CASE WHEN rect THEN lexblock END) AS BIGINT)
             AS rect_lex_touched,
           CAST(COUNT(DISTINCT CASE WHEN rect THEN hashblock END) AS BIGINT)
             AS rect_hash_touched,
           CAST(COUNT(DISTINCT CASE WHEN yband THEN zblock END) AS BIGINT)
             AS yband_z_touched,
           CAST(COUNT(DISTINCT CASE WHEN yband THEN lexblock END) AS BIGINT)
             AS yband_lex_touched,
           CAST(COUNT(*) AS BIGINT) AS rows_total,
           CAST(SUM(CASE WHEN rect THEN 1 ELSE 0 END) AS BIGINT)
             AS rows_rect
    FROM blocks
    """


@register(
    "x64_zorder_layout",
    oracle=_x64_oracle,
    doc="Multi-dimensional layout clustering: Morton-interleave range-"
    "bucketed (customer, order-day) coordinates — the ZORDER BY key "
    "Delta/Iceberg OPTIMIZE uses — then count 1024-file blocks touched "
    "under Z-order vs single-key (customer) sort vs hash layout, for a "
    "1/16 rectangle predicate AND a day-band-only predicate. The "
    "touched/total ratio IS the IO a file-min/max-skipping scan does "
    "at 100 TB: Z-order prunes on BOTH dimensions (rect 64/1024, band "
    "256/1024 here), the single-key sort only on its leading key (the "
    "day band touches every customer-sorted file), hash prunes "
    "nothing. Bit math is integer-exact (+/>>/&), buckets derive from "
    "data bounds broadcast from a 1-row aggregate, and the whole audit "
    "is one scan + one aggregate.",
    bench=True,
    tags=("layout", "zorder", "data-skipping"),
)
def x64_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).cast(
        "bigint"
    )
    bounds = orders.agg(
        F.max("o_custkey").cast("bigint").alias("maxc"),
        F.min(day).alias("mind"),
        F.max(day).alias("maxd"),
    )
    coords = orders.select(
        "o_orderkey", F.col("o_custkey").alias("ck"), day.alias("d")
    ).crossJoin(F.broadcast(bounds))
    coords = coords.select(
        "o_orderkey",
        F.expr("((ck - 1) * 256) div maxc").alias("xb"),
        F.expr("((d - mind) * 256) div (maxd - mind + 1)").alias("yb"),
        F.expr("((ck - 1) * 1024) div maxc").alias("lexblock"),
    )
    blocks = coords.select(
        F.expr(f"{_morton_sql('xb', 'yb')} div 64").alias("zblock"),
        "lexblock",
        (
            portable_hash64(F.col("o_orderkey").cast("string"), seed=64) % 1024
        ).alias("hashblock"),
        F.expr(_X64_RECT).alias("rect"),
        F.expr(_X64_YBAND).alias("yband"),
    )
    return blocks.agg(
        F.count_distinct("zblock").cast("bigint").alias("blocks_z_total"),
        F.count_distinct(
            F.when(F.col("rect"), F.col("zblock"))
        ).cast("bigint").alias("rect_z_touched"),
        F.count_distinct(
            F.when(F.col("rect"), F.col("lexblock"))
        ).cast("bigint").alias("rect_lex_touched"),
        F.count_distinct(
            F.when(F.col("rect"), F.col("hashblock"))
        ).cast("bigint").alias("rect_hash_touched"),
        F.count_distinct(
            F.when(F.col("yband"), F.col("zblock"))
        ).cast("bigint").alias("yband_z_touched"),
        F.count_distinct(
            F.when(F.col("yband"), F.col("lexblock"))
        ).cast("bigint").alias("yband_lex_touched"),
        F.count(F.lit(1)).cast("bigint").alias("rows_total"),
        F.sum(F.when(F.col("rect"), 1).otherwise(0))
        .cast("bigint")
        .alias("rows_rect"),
    )
