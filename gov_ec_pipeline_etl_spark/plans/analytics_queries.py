"""Behavioral-analytics queries over ``events`` (x55–x57, u49):
sessionization, conversion funnel, cohort retention, and a
sketch-vs-exact quantile bound.

The product-analytics surface an events warehouse serves daily —
gap-based sessions, ordered-stage conversion, weekly cohort retention —
each expressed as declarative window/join plans with full DuckDB
oracles. u49 extends the q21b pattern (sketch answers can't hash-match,
so the CLAIMED ERROR BOUND is what's oracled) to quantiles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from gov_ec_pipeline_etl_spark.plans.registry import register
from gov_ec_pipeline_etl_spark.plans.util import T

SESSION_GAP_US = 1_800_000_000  # 30 min


@register(
    "x55_sessionize",
    oracle=f"""
        WITH o AS (
          SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events
        ),
        m AS (
          SELECT user_id, event_id, tsu,
                 CASE WHEN LAG(tsu) OVER w IS NULL
                        OR tsu - LAG(tsu) OVER w > {SESSION_GAP_US}
                      THEN 1 ELSE 0 END AS brk
          FROM o WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
        ),
        s AS (
          SELECT user_id, tsu,
                 SUM(brk) OVER (
                   PARTITION BY user_id ORDER BY tsu, event_id
                   ROWS UNBOUNDED PRECEDING
                 ) AS sid
          FROM m
        )
        SELECT user_id, CAST(sid AS BIGINT) AS session_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MAX(tsu) - MIN(tsu) AS span_us
        FROM s GROUP BY user_id, sid
    """,
    doc="Gap-based batch sessionization (30-min inactivity cut): the "
    "classic lag-gap flag → running-sum session id, then one per-"
    "session aggregate. The batch complement of st02's streaming "
    "session windows — same session semantics, replayable over the "
    "full history. Scale shape: both windows and the final aggregate "
    "share the user_id hash partitioning, so the whole plan is ONE "
    "shuffle; per-user frames are event-count bounded.",
    tags=("window", "sessionization", "analytics"),
)
def x55_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("tsu")
    )
    w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    brk = F.when(
        F.lag("tsu").over(w).isNull()
        | ((F.col("tsu") - F.lag("tsu").over(w)) > SESSION_GAP_US),
        1,
    ).otherwise(0)
    s = o.withColumn("sid", F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return s.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("tsu") - F.min("tsu")).alias("span_us"),
    ).select(
        "user_id",
        F.col("sid").cast("bigint").alias("session_id"),
        "n_events",
        "span_us",
    )


@register(
    "x56_funnel",
    oracle="""
        WITH o AS (
          SELECT user_id, event_type, epoch_us(ts) AS tsu FROM events
        ),
        f AS (
          SELECT user_id, MIN(tsu) AS v FROM o
          WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
          SELECT o.user_id, MIN(o.tsu) AS c FROM o JOIN f USING (user_id)
          WHERE o.event_type = 'click' AND o.tsu >= f.v GROUP BY o.user_id
        ),
        p AS (
          SELECT o.user_id, MIN(o.tsu) AS p FROM o JOIN c USING (user_id)
          WHERE o.event_type = 'purchase' AND o.tsu >= c.c GROUP BY o.user_id
        )
        SELECT CAST(COUNT(f.v) AS BIGINT) AS n_view,
               CAST(COUNT(c.c) AS BIGINT) AS n_click,
               CAST(COUNT(p.p) AS BIGINT) AS n_purchase
        FROM f LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    """,
    doc="Ordered-stage conversion funnel (view → click after the first "
    "view → purchase after that click): each stage is a per-user MIN "
    "over the events at that stage constrained to follow the previous "
    "stage's timestamp — the sequencing join product analytics calls a "
    "'strict-order funnel'. Scale shape: three user-keyed aggregates + "
    "joins all sharing the user_id partitioning (one shuffle family); "
    "stage tables only shrink, and the final count is a single row.",
    tags=("analytics", "funnel", "join"),
)
def x56_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("tsu")
    )
    f = (
        o.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("tsu").alias("v"))
    )
    c = (
        o.where(F.col("event_type") == "click")
        .join(f, "user_id")
        .where(F.col("tsu") >= F.col("v"))
        .groupBy("user_id")
        .agg(F.min("tsu").alias("c"))
    )
    p = (
        o.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("tsu") >= F.col("c"))
        .groupBy("user_id")
        .agg(F.min("tsu").alias("p"))
    )
    return (
        f.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count("v").alias("n_view"),
            F.count("c").alias("n_click"),
            F.count("p").alias("n_purchase"),
        )
    )


@register(
    "x57_cohort_retention",
    oracle="""
        WITH a AS (
          SELECT DISTINCT user_id,
                 CAST(date_trunc('week', ts) AS DATE) AS wk
          FROM events
        ),
        coh AS (SELECT user_id, MIN(wk) AS cwk FROM a GROUP BY user_id)
        SELECT CAST(coh.cwk AS VARCHAR) AS cohort_week,
               CAST(date_diff('day', coh.cwk, a.wk) / 7 AS BIGINT) AS week_offset,
               CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
        FROM a JOIN coh USING (user_id)
        GROUP BY coh.cwk, week_offset
    """,
    doc="Weekly cohort retention: users are cohorted by the ISO week of "
    "their first event; each later active week increments that "
    "cohort's retention cell at its week offset — the classic "
    "retention triangle. date_trunc('week') is ISO-Monday in both "
    "engines, so offsets are exact day-multiples of 7. Scale shape: "
    "the distinct-(user, week) reduction happens FIRST (events → "
    "user-weeks, the big shrink), then everything is user-keyed on one "
    "partitioning; the output is weeks² cells — driver-scale.",
    tags=("analytics", "retention", "aggregation"),
)
def x57_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        T(spark, sf_dir, "events")
        .select(
            "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
        )
        .distinct()
    )
    coh = a.groupBy("user_id").agg(F.min("wk").alias("cwk"))
    return (
        a.join(coh, "user_id")
        .groupBy(
            F.date_format("cwk", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("wk", "cwk") / 7).cast("bigint").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "u49_quantile_sketch_bound",
    oracle="""
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5), 6) AS median_exact_r,
               TRUE AS within_bound
        FROM events GROUP BY event_type
    """,
    doc="Sketch-vs-exact quantile bound (the q21b pattern extended to "
    "quantiles): the engine computes BOTH the exact per-type median "
    "and approx_percentile's KLL-style sketch answer, and emits the "
    "CLAIM |approx - exact| <= 5 percent of the type's value range as "
    "an oracle-asserted boolean — the sketch answer itself can't "
    "hash-match, the bound can (and a sketch regression flips the row "
    "to false). At 100 TB the sketch is the only viable path (exact "
    "quantiles need a per-group sort); this query keeps it honest "
    "against the exact answer while both are still computable.",
    tags=("aggregation", "sketch", "statistics"),
)
def u49_quantile_sketch_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("exact"),
            F.expr("approx_percentile(value, 0.5, 10000)").alias("approx"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .select(
            "event_type",
            F.round("exact", 6).alias("median_exact_r"),
            (
                F.abs(F.col("approx") - F.col("exact"))
                <= (F.col("hi") - F.col("lo")) * 0.05
            ).alias("within_bound"),
        )
    )
