"""Second relational batch: percentiles, correlated subqueries, pivot,
string expression surface, and the uuid5 surrogate path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from gov_ec_pipeline_etl_spark.functions.ids import business_key, surrogate_uuid5
from gov_ec_pipeline_etl_spark.plans.registry import register
from gov_ec_pipeline_etl_spark.plans.util import T


@register(
    "x16_percentiles",
    oracle="""
        SELECT event_type,
               ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 6) AS p50,
               ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY value), 6) AS p90,
               ROUND(MIN(value), 6) AS vmin,
               ROUND(MAX(value), 6) AS vmax
        FROM events
        GROUP BY event_type
    """,
    doc="Exact interpolated percentiles per group (F.percentile ≡ "
    "percentile_cont). SKEW NOTE (r7 gate: eng 1.6→6.8 s, 4.25x, on "
    "the zipf/hot-key sf1 generator): exact percentile semantics merge "
    "each group's full value multiset on one task, so a hot group "
    "collapses group parallelism — inherent to the operator, not the "
    "plan. Hot-group corpora at 100 TB should run the mergeable-sketch "
    "twin u71_percentiles_approx (same output shape, approx_percentile/"
    "KLL, tolerance-gated vs exact — the demonstrated swap) or u49.",
    tags=("agg", "percentile"),
)
def x16_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.percentile("value", 0.5), 6).alias("p50"),
            F.round(F.percentile("value", 0.9), 6).alias("p90"),
            F.round(F.min("value"), 6).alias("vmin"),
            F.round(F.max("value"), 6).alias("vmax"),
        )
    )


@register(
    "u71_percentiles_approx",
    oracle="""
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5), 6) AS p50_exact_r,
               ROUND(quantile_cont(value, 0.9), 6) AS p90_exact_r,
               ROUND(MIN(value), 6) AS vmin,
               ROUND(MAX(value), 6) AS vmax,
               TRUE AS p50_within,
               TRUE AS p90_within
        FROM events
        GROUP BY event_type
    """,
    doc="x16's 100 TB swap, demonstrated (VERDICT r7 #4): the same "
    "per-group percentile shape computed with approx_percentile — "
    "Spark's KLL-style mergeable sketch, map-side combinable, so a hot "
    "group costs partial-sketch merges instead of a one-task multiset "
    "merge (x16's 4.25x skew collapse). The sketch answers can't "
    "hash-match an oracle, so the u49/q21b tolerance-gate pattern "
    "carries them: the query emits the exact percentiles (oracle-"
    "replayable) plus the CLAIM |approx - exact| <= 5 percent of the "
    "group's value range per percentile — a sketch regression flips "
    "the boolean, which IS hash-compared.",
    tags=("agg", "percentile", "sketch", "scale-guard"),
)
def u71_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("e50"),
            F.expr("percentile(value, 0.9)").alias("e90"),
            F.expr("approx_percentile(value, 0.5, 10000)").alias("a50"),
            F.expr("approx_percentile(value, 0.9, 10000)").alias("a90"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .select(
            "event_type",
            F.round("e50", 6).alias("p50_exact_r"),
            F.round("e90", 6).alias("p90_exact_r"),
            F.round("lo", 6).alias("vmin"),
            F.round("hi", 6).alias("vmax"),
            (
                F.abs(F.col("a50") - F.col("e50"))
                <= (F.col("hi") - F.col("lo")) * 0.05
            ).alias("p50_within"),
            (
                F.abs(F.col("a90") - F.col("e90"))
                <= (F.col("hi") - F.col("lo")) * 0.05
            ).alias("p90_within"),
        )
    )


@register(
    "x17_correlated_subquery",
    oracle="""
        SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal
        FROM customer c
        WHERE c_acctbal > (
          SELECT AVG(c_acctbal) FROM customer c2
          WHERE c2.c_mktsegment = c.c_mktsegment
        )
    """,
    doc="Correlated scalar subquery (above-segment-average customers) — "
    "decorrelated by Catalyst into an aggregate + join.",
    tags=("subquery", "join"),
)
def x17_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    T(spark, sf_dir, "customer").createOrReplaceTempView("_q17_customer")
    return spark.sql(
        """
        SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal
        FROM _q17_customer c
        WHERE c_acctbal > (
          SELECT AVG(c_acctbal) FROM _q17_customer c2
          WHERE c2.c_mktsegment = c.c_mktsegment
        )
        """
    )


@register(
    "x18_pivot",
    oracle="""
        SELECT n_name,
          CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END), 0) AS BIGINT) AS automobile,
          CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END), 0) AS BIGINT) AS building,
          CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END), 0) AS BIGINT) AS furniture,
          CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END), 0) AS BIGINT) AS household,
          CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END), 0) AS BIGINT) AS machinery
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    doc="Pivot (long→wide) with an explicit value list — the form that "
    "stays a single aggregate pass; Spark pivot without values would "
    "add a distinct-scan job.",
    tags=("pivot", "agg"),
)
def x18_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer")
    nation = T(spark, sf_dir, "nation")
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    df = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .pivot("c_mktsegment", segs)
        .agg(F.coalesce(F.count(F.lit(1)), F.lit(0)))
    )
    return df.toDF("n_name", *[s.lower() for s in segs]).na.fill(0)


@register(
    "x19_string_expressions",
    oracle="""
        SELECT o_orderkey,
               upper(o_orderpriority) AS pri_upper,
               substr(o_orderpriority, 1, 1) AS pri_code,
               length(o_orderpriority) AS pri_len,
               replace(o_orderpriority, '-', '_') AS pri_snake,
               concat(o_orderstatus, ':', o_orderpriority) AS status_pri,
               CASE WHEN o_totalprice >= 300000 THEN 'high'
                    WHEN o_totalprice >= 100000 THEN 'mid'
                    ELSE 'low' END AS price_band
        FROM orders
    """,
    doc="Scalar string/conditional expression surface (upper, substr, "
    "length, replace, concat, CASE bands) — all codegen builtins.",
    tags=("scalar", "string"),
)
def x19_string_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("pri_upper"),
        F.substring("o_orderpriority", 1, 1).alias("pri_code"),
        F.length("o_orderpriority").cast("bigint").alias("pri_len"),
        F.replace(
            "o_orderpriority", F.lit("-"), F.lit("_")
        ).alias("pri_snake"),
        F.concat(
            F.col("o_orderstatus"), F.lit(":"), F.col("o_orderpriority")
        ).alias("status_pri"),
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
    )


# The golden audit sample is CAPPED (deterministically: lowest keys
# first). A golden cross-check is a spot audit — O(1) by design, never
# O(data): the r8 skewed sf1 gate landed a hot orderkey on the % 600
# lattice and the "sample" became ~1.8 M rows, costing 26.8 s of
# oracle-side VALUES parsing (and the matching engine-side inflation
# flagged by skew_compare). The order columns are a total order on the
# emitted row content, so LIMIT keeps the result deterministic even
# with duplicate (orderkey, linenumber) rows under skew.
R08_SAMPLE_CAP = 20_000


def _r08_oracle(sf_dir: str) -> str:
    """Golden-VALUES oracle: DuckDB has no SHA-1 (so no uuid5), so the
    expected ids for the deterministic sample are computed here with
    CPython's ``uuid`` module — the RFC-4122 reference implementation —
    and embedded as SQL literals. The business keys are rendered with
    plain Python string formatting, independent of the engine's
    concat_ws/cast path, so both the key construction and the uuid are
    cross-checked."""
    import duckdb

    from gov_ec_pipeline_etl_spark.functions.ids import uuid5_py

    con = duckdb.connect()
    try:
        rows = con.execute(
            "SELECT l_orderkey, l_linenumber "
            f"FROM read_parquet('{sf_dir}/lineitem.parquet') "
            "WHERE l_orderkey % 600 = 0 ORDER BY l_orderkey, l_linenumber "
            f"LIMIT {R08_SAMPLE_CAP}"
        ).fetchall()
    finally:
        con.close()
    vals = ", ".join(
        f"('{ok}|{ln}', '{uuid5_py('lineitem', f'{ok}|{ln}')}')" for ok, ln in rows
    )
    return (
        "SELECT * FROM (VALUES "
        + vals
        + ") AS t(business_key, surrogate_id)"
    )


@register(
    "r08_surrogate_uuid5",
    oracle=_r08_oracle,
    doc="RFC-4122 v5 surrogate over the business key (reference K4, "
    "etl/transform.py:483-493) — Arrow-batched pandas UDF, the only "
    "operator besides accent-strip that needs Python. Gated against a "
    "golden-VALUES oracle (CPython-computed uuids for a deterministic "
    "l_orderkey % 600 sample, capped at R08_SAMPLE_CAP lowest keys — an "
    "audit sample is O(1) by design) plus bit-exact unit tests vs "
    "uuid.uuid5.",
    tags=("ids", "reference", "pandas-udf"),
)
def r08_surrogate_uuid5(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        T(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 600 == 0)
        .orderBy("l_orderkey", "l_linenumber")
        .limit(R08_SAMPLE_CAP)
    )
    bk = business_key(li, ["l_orderkey", "l_linenumber"])
    return li.select(
        bk.alias("business_key"),
        surrogate_uuid5(bk, "lineitem").alias("surrogate_id"),
    )


@register(
    "q21b_approx_distinct",
    # HLL sketch values are engine-specific by definition, so the gated
    # output is the TOLERANCE CHECK: exact countDistinct is computed
    # alongside and the query emits abs(approx-exact)/exact <= 0.02 per
    # group; the oracle asserts those booleans are literally true.
    oracle="""
        SELECT l_returnflag,
               TRUE AS orders_within_tol,
               TRUE AS parts_within_tol
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="approx_count_distinct (HyperLogLog++) per group — the 100 TB "
    "substitute for exact distinct counts (no giant distinct shuffle); "
    "rsd=0.01. Gated by emitting the |approx-exact|/exact <= 0.02 bound "
    "as a boolean the oracle asserts literally (exact is computed only "
    "to gate the sketch; production callers use the approx path alone).",
    tags=("agg", "approx"),
)
def q21b_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")

    def within(approx: Column, exact: Column) -> Column:
        return (
            F.abs(approx.cast("double") - exact) / exact <= F.lit(0.02)
        )

    # Exact distincts computed as separate dedupe-then-count aggregates
    # and joined on the (3-row) group key: mixing count_distinct with
    # approx_count_distinct in ONE aggregate makes Spark Expand every
    # row per distinct column and push the wide HLL buffers through the
    # multi-phase plan (measured 27 s warm at sf0.1 vs ~1 s split).
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
    )

    def exact(col: str, out: str) -> DataFrame:
        return (
            li.select("l_returnflag", col)
            .distinct()
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias(out))
        )

    agg = approx.join(exact("l_orderkey", "exact_orders"), "l_returnflag").join(
        exact("l_partkey", "exact_parts"), "l_returnflag"
    )
    return agg.select(
        "l_returnflag",
        within(F.col("approx_orders"), F.col("exact_orders")).alias(
            "orders_within_tol"
        ),
        within(F.col("approx_parts"), F.col("exact_parts")).alias(
            "parts_within_tol"
        ),
    )
