"""Window-function surface: ranking, running aggregates, lag/lead, as-of join.

ABSENT in the reference except one dedup-by-latest pattern (SURVEY.md §2.10
DD2); Spark windows supply the full surface. The as-of join is implemented
with the union + conditional-last-value pattern — linear in input size and
shuffle-partitioned by the join key, unlike a naive range join which
explodes quadratically per key at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from gov_ec_pipeline_etl_spark.plans.registry import register
from gov_ec_pipeline_etl_spark.plans.util import T


@register(
    "q20_topk_per_group",
    oracle="""
        SELECT o_custkey, o_orderkey, rnk FROM (
          SELECT o_custkey, o_orderkey,
                 ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
                 ) AS rnk
          FROM orders
        ) WHERE rnk <= 3
    """,
    doc="Top-k per group via row_number window; deterministic tie-break on "
    "the key column.",
    bench=True,
    tags=("window", "topk"),
)
def q20_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        T(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).cast("bigint").alias("rnk"),
        )
        .where(F.col("rnk") <= 3)
    )


@register(
    "x21_running_sum",
    oracle="""
        SELECT event_id,
               ROUND(SUM(value) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 4) AS running_value
        FROM events
    """,
    doc="Per-user running sum in event-time order (explicit ROWS frame; "
    "deterministic tie-break so both engines accumulate identically).",
    tags=("window",),
)
def x21_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return T(spark, sf_dir, "events").select(
        "event_id", F.round(F.sum("value").over(w), 4).alias("running_value")
    )


@register(
    "x22_lag_delta",
    oracle="""
        SELECT event_id,
               ROUND(value - LAG(value) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
               ), 4) AS delta
        FROM events
    """,
    doc="LAG-based delta vs previous event per user.",
    tags=("window",),
)
def x22_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return T(spark, sf_dir, "events").select(
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta"),
    )


@register(
    "x23_moving_avg",
    oracle="""
        SELECT event_id,
               ROUND(AVG(value) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
               ), 6) AS mavg
        FROM events
    """,
    doc="Sliding-frame moving average (ROWS 3 PRECEDING).",
    tags=("window",),
)
def x23_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return T(spark, sf_dir, "events").select(
        "event_id", F.round(F.avg("value").over(w), 6).alias("mavg")
    )


@register(
    "x24_segment_rank",
    oracle="""
        SELECT c_mktsegment, c_custkey, rnk FROM (
          SELECT c_mktsegment, c_custkey,
                 RANK() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey
                 ) AS rnk
          FROM customer
        ) WHERE rnk <= 5
    """,
    doc="RANK within segment, top-5.",
    tags=("window", "topk"),
)
def x24_segment_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        T(spark, sf_dir, "customer")
        .select(
            "c_mktsegment",
            "c_custkey",
            F.rank().over(w).cast("bigint").alias("rnk"),
        )
        .where(F.col("rnk") <= 5)
    )


@register(
    "q25_asof_join",
    oracle="""
        SELECT p.event_id AS purchase_id,
               epoch_us(c.ts) AS click_ts_us,
               c.value        AS click_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="As-of join: for each purchase, the most recent click at-or-before "
    "it per user. Implemented as union + conditional last_value over a "
    "rows-frame window — one shuffle on user_id, linear in events, no "
    "per-key quadratic range join (the 100 TB-safe as-of pattern).",
    bench=True,
    tags=("asof-join", "window"),
)
def q25_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    )
    # kind orders clicks before purchases at identical timestamps so an
    # equal-ts click is visible to the purchase (ASOF >= semantics).
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.when(F.col("event_type") == "click", F.lit(0)).otherwise(F.lit(1)).alias("kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.last(
        F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True
    ).over(w)
    click_value = F.last(
        F.when(F.col("kind") == 0, F.col("value")), ignorenulls=True
    ).over(w)
    return (
        tagged.select(
            "event_id",
            "kind",
            F.unix_micros(click_ts).alias("click_ts_us"),
            click_value.alias("click_value"),
        )
        .where(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("purchase_id"), "click_ts_us", "click_value"
        )
    )


@register(
    "x33_range_frame",
    oracle="""
        SELECT event_id,
               COUNT(*) OVER (
                 PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW
               ) AS n_last_10min
        FROM events
    """,
    doc="Time-based RANGE window frame: events per user in the trailing "
    "10 minutes — ordered by epoch micros so the frame bound is a plain "
    "integer range in both engines.",
    tags=("window", "range-frame"),
)
def x33_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id", F.count(F.lit(1)).over(w).alias("n_last_10min")
    )


@register(
    "w02_distribution_windows",
    oracle="""
        WITH spend AS (
          SELECT c_mktsegment, o_custkey,
                 ROUND(SUM(o_totalprice), 2) AS spend
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment, o_custkey
        )
        SELECT c_mktsegment, o_custkey, spend,
               CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
               ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
               ROUND(CUME_DIST() OVER w, 6) AS cume
        FROM spend
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY spend, o_custkey)
    """,
    doc="Distribution window functions (the last uncovered window "
    "surface): per-segment customer-spend quartiles via ntile, "
    "percent_rank and cume_dist over a deterministic total order "
    "(rounded spend, custkey tie-break). One shuffle for the agg; the "
    "window reuses the segment partitioning. w-tier name: outside the "
    "driver's 50-slot recording window (registry docstring).",
    tags=("window", "agg"),
)
def w02_distribution_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer")
    spend = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy("spend", "o_custkey")
    return spend.select(
        "c_mktsegment",
        "o_custkey",
        "spend",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "w07_ewma_smoothing",
    oracle="""
        SELECT user_id, event_id,
               FLOOR(list_reduce(
                 list(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 31 PRECEDING AND CURRENT ROW
                 ),
                 (acc, x) -> acc * 0.7 + x * 0.3
               ) * 1000000) / 1000000 AS ewma_r
        FROM events
    """,
    doc="Per-user exponential moving average (alpha=0.3) of event "
    "values — the decay-weighted smoothing primitive a monitoring tier "
    "runs over metric streams. The recursion y = 0.7*y + 0.3*v is "
    "evaluated as an ORDERED FOLD over the window frame (seed = first "
    "element), so both engines execute the identical sequence of "
    "multiply-adds — bit-identical doubles, no pow() (libm pow is not "
    "cross-engine ulp-stable). Output quantizes via FLOOR of the "
    "scaled double, not ROUND: the fold of 2dp inputs through 0.7/0.3 "
    "produces exact 7-digit decimals ending in 5 — true 6dp ROUND "
    "boundaries where Spark's decimal-string rounding and DuckDB's "
    "binary rounding disagree (34 rows per 1M at sf1, caught by the "
    "round-5 scale gate); floor of the identical double cannot "
    "diverge. The frame is bounded at 32 rows "
    "(weight 0.7^31 < 2e-5 — the definition here, and the bound that "
    "keeps per-row state constant at 100 TB instead of materializing "
    "each user's full history per row).",
    tags=("window", "timeseries", "monitoring"),
)
def w07_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-31, Window.currentRow)
    )
    arr = F.collect_list("value").over(w)
    witharr = T(spark, sf_dir, "events").select(
        "user_id", "event_id", arr.alias("arr")
    )
    ewma = F.aggregate(
        F.slice(
            F.col("arr"), F.lit(2), F.greatest(F.size("arr") - 1, F.lit(0))
        ),
        F.element_at("arr", 1),
        lambda acc, x: acc * F.lit(0.7) + x * F.lit(0.3),
    )
    return witharr.select(
        "user_id",
        "event_id",
        (F.floor(ewma * 1000000) / 1000000).alias("ewma_r"),
    )


@register(
    "x54_winsorize",
    oracle="""
        WITH b AS (
          SELECT event_type,
                 quantile_cont(value, 0.05) AS lo,
                 quantile_cont(value, 0.95) AS hi
          FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               ROUND(lo, 6) AS lo_r, ROUND(hi, 6) AS hi_r,
               CAST(SUM(CASE WHEN e.value < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
               CAST(SUM(CASE WHEN e.value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
               ROUND(AVG(LEAST(GREATEST(e.value, lo), hi)), 6) AS avg_clip_r
        FROM events e JOIN b USING (event_type)
        GROUP BY e.event_type, lo, hi
    """,
    doc="Per-group percentile winsorization (p05/p95 clip) — the "
    "outlier-robust feature-normalization pass. Exact linearly "
    "interpolated percentiles (Spark `percentile` == DuckDB "
    "quantile_cont: both index p*(n-1)); a clip boundary is either "
    "exactly a data value (integer index or tied neighbors) or "
    "strictly between two adjacent sorted values, so ulp jitter in the "
    "interpolation can never flip a comparison against a data value — "
    "the clipped counts are exact cross-engine. Scale shape: one "
    "aggregate for the 5-row bounds table (exact percentile needs the "
    "per-group sort; at 100 TB swap in approx_percentile with the same "
    "plan), broadcast back over one scan, one final aggregate.",
    tags=("aggregation", "statistics", "quality"),
)
def x54_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    b = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        ev.join(F.broadcast(b), "event_type")
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_below"),
            F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_above"),
            F.round(F.avg(clipped), 6).alias("avg_clip_r"),
        )
        .select(
            "event_type",
            F.round("lo", 6).alias("lo_r"),
            F.round("hi", 6).alias("hi_r"),
            "n_below",
            "n_above",
            "avg_clip_r",
        )
    )
