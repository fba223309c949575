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


def test_gen_testdata_skew_mode(tmp_path):
    """--skew produces the adversarial layout the scale gate relies on:
    ~30% of orders hit one customer, the zipf vocabulary concentrates
    the top token, and schema/row counts stay identical to uniform —
    same gate, same oracles, different physics."""
    import sys

    import pyarrow.parquet as pq

    sys.path.insert(0, "/root/repo/tools")
    import gen_testdata as g

    u, s = str(tmp_path / "u"), str(tmp_path / "s")
    g.generate(0.001, u)
    g.generate(0.001, s, skew=True)
    for name in ("orders", "lineitem", "documents"):
        tu = pq.read_table(f"{u}/{name}.parquet")
        ts = pq.read_table(f"{s}/{name}.parquet")
        assert tu.schema.equals(ts.schema)
        assert tu.num_rows == ts.num_rows
    ords = pq.read_table(f"{s}/orders.parquet").to_pydict()
    hot = sum(1 for c in ords["o_custkey"] if c == 0) / len(ords["o_custkey"])
    assert 0.25 < hot < 0.35
    uords = pq.read_table(f"{u}/orders.parquet").to_pydict()
    uhot = sum(1 for c in uords["o_custkey"] if c == 0) / len(uords["o_custkey"])
    assert uhot < 0.05
    # zipf vocabulary: the hottest token carries >25% of document mass
    docs = pq.read_table(f"{s}/documents.parquet").to_pydict()["text"]
    from collections import Counter

    c = Counter(t for d in docs for t in d.split())
    assert c.most_common(1)[0][1] / sum(c.values()) > 0.25
