"""Bucketed co-located join: both sides bucketed+sorted on the join key
⇒ the join plan contains NO shuffle exchange, and results equal the
plain join."""

from __future__ import annotations

import pyspark.sql.functions as F

from gov_ec_pipeline_etl_spark.sinks.bucketed import read_bucketed, write_bucketed
from tests.conftest import SF_SMOKE


def test_bucketed_join_no_exchange(spark):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    write_bucketed(orders, "t_orders_b", ["o_orderkey"], n_buckets=4)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        ["o_orderkey"],
        n_buckets=4,
    )
    prev_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path (broadcast would also avoid shuffles,
        # but bucketing is what we're demonstrating)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = read_bucketed(spark, "t_orders_b")
        b = read_bucketed(spark, "t_lineitem_b")
        joined = a.join(b, "o_orderkey").groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: no shuffle before the join (the final agg may
        # exchange; assert no exchange below the SortMergeJoin inputs by
        # checking the join inputs are FileScans without Exchange)
        join_idx = plan.find("SortMergeJoin")
        assert join_idx != -1, plan
        below_join = plan[join_idx:]
        assert "Exchange hashpartitioning(o_orderkey" not in below_join, plan
        # correctness: equals the plain (shuffled) join
        plain = (
            orders.join(
                li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_threshold)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
