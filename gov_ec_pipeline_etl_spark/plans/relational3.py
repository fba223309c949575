"""Third relational batch: set-union analytics, IN subqueries, HAVING,
arg-max aggregates, null-safe comparisons, date arithmetic, filtered
aggregates — rounding out the ANSI surface (all ABSENT in the reference,
all supplied natively by Spark SQL; SURVEY.md §2.11-2.12).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from gov_ec_pipeline_etl_spark.plans.registry import register
from gov_ec_pipeline_etl_spark.plans.util import T


@register(
    "x26_union_all_activity",
    oracle="""
        SELECT kind, ym, COUNT(*) AS n FROM (
          SELECT 'order' AS kind, strftime(o_orderdate, '%Y-%m') AS ym FROM orders
          UNION ALL
          SELECT 'ship' AS kind, strftime(l_shipdate, '%Y-%m') AS ym FROM lineitem
        ) GROUP BY kind, ym
    """,
    doc="UNION ALL of two typed activity streams into one monthly "
    "aggregate (bag semantics, no dedup shuffle).",
    tags=("set-op", "agg"),
)
def x26_union_all_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders").select(
        F.lit("order").alias("kind"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )
    ship = T(spark, sf_dir, "lineitem").select(
        F.lit("ship").alias("kind"),
        F.date_format("l_shipdate", "yyyy-MM").alias("ym"),
    )
    return (
        orders.unionAll(ship)
        .groupBy("kind", "ym")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "x27_in_subquery",
    oracle="""
        SELECT o_orderkey, o_custkey
        FROM orders
        WHERE o_custkey IN (
          SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        ) AND o_orderstatus = 'O'
    """,
    doc="Uncorrelated IN subquery → left-semi join after Catalyst "
    "rewrite.",
    tags=("subquery", "semi-join"),
)
def x27_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    T(spark, sf_dir, "orders").createOrReplaceTempView("_q27_orders")
    T(spark, sf_dir, "customer").createOrReplaceTempView("_q27_customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM _q27_orders
        WHERE o_custkey IN (
          SELECT c_custkey FROM _q27_customer WHERE c_mktsegment = 'MACHINERY'
        ) AND o_orderstatus = 'O'
        """
    )


@register(
    "x28_having",
    oracle="""
        SELECT o_custkey, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders
        GROUP BY o_custkey
        HAVING COUNT(*) >= 15
    """,
    doc="HAVING post-aggregate filter (customers with ≥15 orders).",
    tags=("agg", "having"),
)
def x28_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .where(F.col("n_orders") >= 15)
    )


@register(
    "x29_argmax",
    oracle="""
        SELECT o_custkey,
               arg_max(o_orderkey, o_totalprice) AS best_orderkey,
               ROUND(MAX(o_totalprice), 2) AS best_price
        FROM orders
        GROUP BY o_custkey
    """,
    doc="arg-max aggregate (max_by): the single-pass alternative to a "
    "rank-1 window when only the extremal row's key is needed.",
    tags=("agg", "argmax"),
)
def x29_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("best_orderkey"),
            F.round(F.max("o_totalprice"), 2).alias("best_price"),
        )
    )


@register(
    "x30_null_safe",
    oracle="""
        SELECT
          CAST(SUM(CASE WHEN value IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_eq,
          CAST(SUM(CASE WHEN nullif(event_type, 'error') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_error_or_null,
          CAST(SUM(CASE WHEN coalesce(value, 0.0) = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zeroish
        FROM (
          SELECT CASE WHEN value < 1.0 THEN NULL ELSE value END AS value, event_type
          FROM events
        )
    """,
    doc="Null-handling surface: null-safe equality (<=> / IS NOT "
    "DISTINCT FROM), nullif, coalesce.",
    tags=("scalar", "null"),
)
def x30_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").select(
        F.when(F.col("value") < 1.0, None).otherwise(F.col("value")).alias("value"),
        "event_type",
    )
    return ev.agg(
        F.sum(
            F.when(F.col("value").eqNullSafe(F.lit(None)), 1).otherwise(0)
        ).alias("n_null_eq"),
        F.sum(
            F.when(F.nullif("event_type", F.lit("error")).isNull(), 1).otherwise(0)
        ).alias("n_error_or_null"),
        F.sum(
            F.when(F.coalesce("value", F.lit(0.0)) == 0.0, 1).otherwise(0)
        ).alias("n_zeroish"),
    )


@register(
    "x31_date_arithmetic",
    oracle="""
        SELECT
          strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
          CAST(EXTRACT(dow FROM o_orderdate) AS INTEGER) AS dow,
          COUNT(*) AS n,
          ROUND(AVG(EXTRACT(day FROM o_orderdate)), 6) AS avg_dom
        FROM orders
        GROUP BY month_start, dow
    """,
    doc="Date arithmetic surface: truncation, day-of-week, day-of-month "
    "extraction. DuckDB dow is 0=Sunday; Spark dayofweek is 1=Sunday — "
    "aligned via -1.",
    tags=("scalar", "datetime", "agg"),
)
def x31_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return (
        o.select(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "month_start"
            ),
            (F.dayofweek("o_orderdate") - 1).alias("dow"),
            F.dayofmonth("o_orderdate").alias("dom"),
        )
        .groupBy("month_start", "dow")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("dom"), 6).alias("avg_dom"),
        )
    )


@register(
    "x32_filtered_agg",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
               COUNT(*) FILTER (WHERE l_tax = 0) AS n_taxfree,
               ROUND(SUM(l_extendedprice) FILTER (WHERE l_quantity >= 25), 2)
                 AS big_line_revenue
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="FILTER-ed aggregates (conditional aggregation in one pass).",
    tags=("agg", "filter"),
)
def x32_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        F.count(F.when(F.col("l_tax") == 0, 1)).alias("n_taxfree"),
        F.round(
            F.sum(F.when(F.col("l_quantity") >= 25, F.col("l_extendedprice"))), 2
        ).alias("big_line_revenue"),
    )


@register(
    "x34_salted_agg",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               ROUND(SUM(value), 2) AS total,
               ROUND(MAX(value), 6) AS vmax
        FROM events
        GROUP BY event_type
    """,
    doc="Two-phase SALTED aggregation (groupBy(key, salt) partials → "
    "groupBy(key) final) for hot keys a hash aggregate can't split — "
    "semantically identical to the plain GROUP BY, which is exactly what "
    "the oracle asserts. event_type has only 5 values, i.e. every key is "
    "'hot': the worst case for an unsalted agg, the intended case here.",
    tags=("agg", "skew", "salting"),
)
def x34_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_ec_pipeline_etl_spark.operators.skew import salted_two_phase_agg

    ev = T(spark, sf_dir, "events")
    return salted_two_phase_agg(
        ev,
        keys=["event_type"],
        partial_aggs=lambda: [
            F.count(F.lit(1)).alias("_n"),
            F.sum("value").alias("_sum"),
            F.max("value").alias("_max"),
        ],
        final_aggs=lambda: [
            F.sum("_n").alias("n"),
            F.round(F.sum("_sum"), 2).alias("total"),
            F.round(F.max("_max"), 6).alias("vmax"),
        ],
        salt_buckets=16,
    )


@register(
    "x35_string_agg",
    oracle="""
        SELECT l_returnflag,
               string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
               COUNT(DISTINCT l_linestatus) AS n_statuses
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Ordered string aggregation (collect_set → sort → join ≡ "
    "string_agg DISTINCT ORDER BY) — deterministic by construction.",
    tags=("agg", "string-agg"),
)
def x35_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(
            F.array_sort(F.collect_set("l_linestatus")), ","
        ).alias("statuses"),
        F.countDistinct("l_linestatus").alias("n_statuses"),
    )


@register(
    "x36_json_extract",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events
        GROUP BY event_type
    """,
    doc="Semi-structured JSON column processing (the reference's extras "
    "JSONB, read side): typed from_json extraction aggregated per "
    "event_type — schema-on-read without a UDF.",
    tags=("json", "agg", "semi-structured"),
)
def x36_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    k = F.from_json("props", "k BIGINT")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "x37_month_share_of_year",
    oracle="""
        WITH monthly AS (
          SELECT strftime(o_orderdate, '%Y') AS y,
                 strftime(o_orderdate, '%Y-%m') AS ym,
                 SUM(o_totalprice) AS rev
          FROM orders GROUP BY y, ym
        )
        SELECT ym, ROUND(rev, 2) AS revenue,
               ROUND(rev / SUM(rev) OVER (PARTITION BY y), 6) AS share_of_year
        FROM monthly
    """,
    doc="Window over an aggregate (two-level analytic): monthly revenue "
    "and its share of the year — aggregate once, window over the "
    "aggregated (small) frame, no second pass over the fact table.",
    tags=("window", "agg", "analytic"),
)
def x37_month_share_of_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = T(spark, sf_dir, "orders")
    monthly = (
        o.select(
            F.date_format("o_orderdate", "yyyy").alias("y"),
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
            "o_totalprice",
        )
        .groupBy("y", "ym")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w = Window.partitionBy("y")
    return monthly.select(
        "ym",
        F.round("rev", 2).alias("revenue"),
        F.round(F.col("rev") / F.sum("rev").over(w), 6).alias("share_of_year"),
    )


@register(
    "x38_bag_set_ops",
    oracle="""
        SELECT custkey, COUNT(*) AS multiplicity FROM (
          SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
          EXCEPT ALL
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        ) GROUP BY custkey
    """,
    doc="Bag-semantics set op (EXCEPT ALL): per-customer surplus of open "
    "over finished orders, multiplicities preserved.",
    tags=("set-op", "bag"),
)
def x38_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    open_ = o.where("o_orderstatus = 'O'").select(
        F.col("o_custkey").alias("custkey")
    )
    fin = o.where("o_orderstatus = 'F'").select(
        F.col("o_custkey").alias("custkey")
    )
    return (
        open_.exceptAll(fin)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
    )
