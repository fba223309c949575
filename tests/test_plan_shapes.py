"""Plan-shape regression guards for the round-2 performance work.

These lock in properties the bench numbers depend on: the cosine hot
path stays a flat codegen expression (array HOFs are interpreted per
element — PERF.md item 2/8), the MinHash pipeline keeps its reduced
exchange count (item 10), and scans stay column-pruned. Plan strings
are version-sensitive; assertions target stable substrings only.
"""

from __future__ import annotations

import re

from gov_ec_pipeline_etl_spark.plans import all_queries
from tests.conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    q = all_queries()[name]
    return (
        q.spark(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    )


def test_cosine_hot_path_is_flat_expression(spark):
    plan = _plan(spark, "s01_cosine_topk")
    # the per-PAIR kernel must not be a zip_with/aggregate lambda chain
    assert "zip_with" not in plan
    # ...and must appear as the unrolled elementwise product
    assert re.search(r"qv#\d+\[0\] \* cv#\d+\[0\]", plan), plan[:500]
    # per-ROW vector cast (as_double) is the only tolerated HOF site
    assert plan.lower().count("lambdafunction") <= 4


def test_lsh_bucket_kernel_stays_arrow(spark):
    """s03/u19's hyperplane bucket keys must come from the Arrow
    sequential-fold kernel, never the unrolled literal-SQL chain: at
    8 planes x 64 dims that chain (~512 multiply-add terms) exceeded
    Janino's 64 KB method limit and the whole join stage silently fell
    back to interpreted eval (round-6 verdict What's-wrong #2). The
    Arrow kernel prints as ArrowEvalPython; the literal kernel printed
    hundreds of plane coefficients into the plan string."""
    plan = _plan(spark, "s03_ann_lsh_topk")
    assert "ArrowEvalPython" in plan
    # the literal kernel embedded every rounded plane coefficient; a
    # handful of decimal literals is normal, hundreds means regression
    assert len(re.findall(r"-?0\.\d{4,}", plan)) < 50, (
        "literal hyperplane coefficients are back in the plan"
    )


def test_minhash_exchange_budget(spark):
    """The single-exchange shingle pipeline holds: regressing to
    distinct()-based dedup or a band self-join adds exchanges.

    Cache-hit substitution rewrites subplans as InMemoryTableScan nodes
    whose printed form embeds their own child exchanges, so an earlier
    test's persisted fragment can inflate the count — measure the fresh
    plan."""
    spark.catalog.clearCache()
    plan = _plan(spark, "d02_minhash_lsh")
    assert plan.count("Exchange") <= 18, plan.count("Exchange")


def test_scans_column_pruned(spark):
    """Projection reaches the parquet scan: a 2-column query must not
    read the whole documents schema (5 columns)."""
    plan = _plan(spark, "t01_token_counts")
    m = re.search(r"ReadSchema: (\S+)", plan)
    assert m and m.group(1) == "struct<doc_id:bigint,text:string>", m


def test_flagship_filter_pushdown(spark):
    """q01's shipdate filter reaches the lineitem scan."""
    plan = _plan(spark, "q01_pricing_summary")
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1][:200]


def test_timestamp_filters_reach_scan(spark):
    """Timestamp range predicates must push into the parquet scan.

    Guards the read_table NTZ normalization: inference is disabled
    scan-side (TimestampType comes straight off the footer), so date
    filters stay pushable. A post-scan NTZ->TIMESTAMP cast would
    silently turn these into residual filters."""
    plan = _plan(spark, "x43_returned_items")
    pushed = " ".join(
        m.group(0) for m in re.finditer(r"PushedFilters: \[[^\]]*\]", plan)
    )
    assert "GreaterThanOrEqual(o_orderdate" in pushed, pushed
    assert "EqualTo(l_returnflag,R)" in pushed, pushed


def test_tpch_dims_broadcast(spark):
    """The new TPC-H tier keeps dimension sides broadcast: no
    sort-merge join may appear in x43's plan at smoke scale."""
    plan = _plan(spark, "x43_returned_items")
    assert "SortMergeJoin" not in plan, plan[:800]
    assert plan.count("BroadcastHashJoin") >= 2, plan[:800]


def test_queries_survive_empty_tables(spark, tmp_path):
    """A filtered-to-empty input is routine at scale: a representative
    query per tier must return its empty result, not crash (guards
    vec_dim's missing-first-row path among others)."""
    import os

    from gov_ec_pipeline_etl_spark.tables import TABLES, read_table

    empty_dir = str(tmp_path / "empty_sf")
    for t in TABLES:
        read_table(spark, SF_SMOKE, t).limit(0).write.mode("overwrite").parquet(
            os.path.join(empty_dir, f"{t}.parquet")
        )
    qs = all_queries()
    for name in [
        "q01_pricing_summary",
        "d02_minhash_lsh",
        "s01_cosine_topk",
        "s02_embedding_neardup",
        "u06_ivf_topk",
        "w03_zscore_normalize",
        "x43_returned_items",
    ]:
        assert qs[name].spark(spark, empty_dir).count() == 0, name


def test_text_queries_survive_degenerate_docs(spark, tmp_path):
    """Null, empty, and whitespace-only document text must flow through
    the text/dedup tiers without crashing (routine at corpus scale)."""
    import os

    from gov_ec_pipeline_etl_spark.tables import TABLES, read_table

    d = str(tmp_path / "degenerate_sf")
    for t in TABLES:
        df = read_table(spark, SF_SMOKE, t)
        if t == "documents":
            norm = df.limit(3)
            weird = spark.createDataFrame(
                [
                    (90001, None, "en", "web", 0),
                    (90002, "", "en", "web", 0),
                    (90003, "   ", "en", "web", 3),
                ],
                norm.schema,
            )
            df = norm.unionByName(weird)
        df.write.mode("overwrite").parquet(os.path.join(d, f"{t}.parquet"))
    qs = all_queries()
    for name in [
        "t01_token_counts",
        "t02_quality_score",
        "t04_fingerprint",
        "d01_exact_dedup",
        "d02_minhash_lsh",
        "d04_ngram_jaccard",
        "w01_training_shuffle",
        "w03_zscore_normalize",
    ]:
        # no crash; the 3 real docs (at least) survive every tier
        assert qs[name].spark(spark, d).count() >= 3, name


def test_banded_lsh_has_no_cartesian(spark):
    """The banded near-dup path must generate candidates through the
    (band, key) equi-join — never a cartesian/nested-loop product —
    and fetch vectors for candidate pairs only."""
    from gov_ec_pipeline_etl_spark.operators.similarity import cosine_near_pairs
    from gov_ec_pipeline_etl_spark.plans.util import T

    emb = T(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    df = cosine_near_pairs(emb, bucketed=True, n_planes=12, bands=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    from gov_ec_pipeline_etl_spark.caching import unpersist_inputs

    unpersist_inputs(df)


def test_planted_skew_salted_paths(spark):
    """Planted-skew stress (r4 VERDICT #6): one key holding ~30% of
    600k rows. The salted two-phase agg must (a) carry the salt column
    through its FIRST HashAggregate phase — plan shape — and (b)
    actually spread the hot key across salt buckets so no single
    reduce group (the straggler task's unit of work) sees more than a
    bucket's share. Same for the replicated broadcast join: join keys
    include the salt, build side replicates, and the hot key's probe
    rows split across salt values."""
    import pyspark.sql.functions as F

    from gov_ec_pipeline_etl_spark.operators.skew import (
        SALT_COL,
        replicate_broadcast_join,
        salted_two_phase_agg,
    )

    n, buckets = 600_000, 16
    # key 0 holds 30% of rows; the rest spread over 1000 keys
    big = spark.range(n).select(
        F.when(F.col("id") % 10 < 3, F.lit(0))
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("x"),
    )

    agg = salted_two_phase_agg(
        big,
        ["k"],
        partial_aggs=lambda: [
            F.sum("x").alias("s"), F.count(F.lit(1)).alias("c")
        ],
        final_aggs=lambda: [
            F.sum("s").alias("sum_x"), F.sum("c").alias("n_rows")
        ],
        salt_buckets=buckets,
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert SALT_COL in plan  # phase-1 grouping carries the salt
    assert plan.count("HashAggregate") >= 4  # partial+final × two phases
    res = {r.k: (r.sum_x, r.n_rows) for r in agg.collect()}
    naive = {r.k: (r["sum(x)"], r["count(1)"]) for r in big.groupBy("k").agg(
        F.sum("x"), F.count(F.lit(1))).collect()}
    assert res == naive  # pure plan rewrite, identical semantics
    # the hot key's phase-1 groups each hold ~1/buckets of its rows:
    # no reduce group (straggler unit) exceeds 2x the fair share
    salted = big.withColumn(SALT_COL, (F.rand(seed=7) * buckets).cast("int"))
    per_group = (
        salted.where(F.col("k") == 0)
        .groupBy(SALT_COL).count().agg(F.max("count")).first()[0]
    )
    hot_total = naive[0][1]
    assert per_group <= 2 * hot_total / buckets

    dim = spark.range(1000).select(F.col("id").alias("k"), F.lit("d").alias("tag"))
    joined = replicate_broadcast_join(big, dim, "k", salt_buckets=8)
    jplan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in jplan
    assert SALT_COL in jplan  # the join keys carry the salt
    assert "CartesianProduct" not in jplan
    assert joined.count() == n  # every row matches exactly one dim row


def test_runtime_bloom_filter_injects_on_shuffle_join(spark):
    """100 TB posture: Spark's InjectRuntimeFilter (default-on) builds a
    bloom filter from a selectively-filtered join side and pushes it
    into the big side's scan, pruning shuffle input when the dim side
    is too big to broadcast. The size thresholds (creation 10 MB,
    application-scan 10 GB) are met natively at scale; this test lowers
    the application threshold to make the tiny fixture eligible and
    pins that the plan carves the filter in — a conf regression (or a
    future session default disabling it) fails here."""
    import pyspark.sql.functions as F

    from tests.conftest import SF_CORRECT

    to_restore = {
        "spark.sql.autoBroadcastJoinThreshold": None,
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": None,
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": None,
    }
    for k in to_restore:
        try:
            to_restore[k] = spark.conf.get(k)
        except Exception:
            pass
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "1KB",
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "10MB",
        )
        li = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet")
        o = spark.read.parquet(f"{SF_CORRECT}/orders.parquet").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:800]
        assert "might_contain" in plan.lower(), plan[:800]
    finally:
        for k, v in to_restore.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_pii_scrub_is_map_only(spark):
    """u45 is pure per-row regex work: no exchange, no Python node."""
    plan = _plan(spark, "u45_pii_scrub")
    assert "Exchange" not in plan, plan[:800]
    assert "Python" not in plan and "ArrowEval" not in plan


def test_line_dedup_aggregates_not_windows(spark):
    """u46's keep-first rule must stay a min-struct AGGREGATE: a
    regression to a per-line row_number would put a Window (with a
    per-key sort) on the hot boilerplate lines."""
    plan = _plan(spark, "u46_line_dedup")
    assert "Window" not in plan, plan[:800]
    # explode → line-stats agg (+ join) → doc reassembly: exchange
    # budget stays small (broadcast of the stats side at smoke scale)
    assert plan.count("Exchange hashpartitioning") <= 3


def test_sessionize_single_shuffle(spark):
    """x55's windows and final aggregate all share the user_id hash
    partitioning — exactly ONE exchange."""
    plan = _plan(spark, "x55_sessionize")
    assert plan.count("Exchange hashpartitioning") == 1, plan.count(
        "Exchange hashpartitioning"
    )


def test_pagerank_topk_not_global_window(spark):
    """x58's final top-20 is a distributed TakeOrdered; a global
    ranking Window over the node table is the regression."""
    plan = _plan(spark, "x58_pagerank")
    assert "TakeOrderedAndProject" in plan


def test_interval_islands_single_shuffle(spark):
    """u55's two windows and the island aggregate all share the key
    hash partitioning (HashPartitioning(key) satisfies the (key,
    island) clustering) — exactly ONE exchange."""
    plan = _plan(spark, "u55_interval_islands")
    assert plan.count("Exchange hashpartitioning") == 1, plan[:800]


def test_scd2_single_shuffle(spark):
    """x63: change-flag window, version window, and the run aggregate
    ride one user_id partitioning — exactly ONE exchange."""
    plan = _plan(spark, "x63_scd2_build")
    assert plan.count("Exchange hashpartitioning") == 1, plan[:800]


def test_time_rollup_is_one_expand_pass(spark):
    """x62: the three grains come from ONE grouping-sets pass — a
    single Expand feeding a single shuffled aggregate, not one
    scan/exchange per grain."""
    plan = _plan(spark, "x62_time_rollup")
    assert plan.count("Expand") == 1, plan[:800]
    assert plan.count("Exchange hashpartitioning") == 1, plan[:800]
    assert plan.count("FileScan") == 1


def test_market_basket_no_orderkey_self_join(spark):
    """x59 generates pairs by in-row double-explode of the per-basket
    set: no orderkey-keyed join anywhere, and at runtime AQE reuses
    the collect_set aggregate's exchange across the pair/marginal/
    count consumers (pre-AQE each consumer prints its own copy)."""
    import re

    from gov_ec_pipeline_etl_spark.plans import all_queries

    from gov_ec_pipeline_etl_spark.caching import unpersist_inputs

    q = all_queries()["x59_market_basket"]
    df = q.spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    unpersist_inputs(df)
    assert "SortMergeJoin [l_orderkey" not in plan
    assert plan.count("Generate explode") >= 2  # pair + marginal explodes
    # the basket-set aggregate is persisted: every consumer reads an
    # InMemoryTableScan leaf (whose printed form embeds the build
    # plan's exchange — the orderkey shuffle executes once regardless)
    assert plan.count("InMemoryTableScan") >= 3, plan[:1500]


def test_hll_merge_single_corpus_pass(spark):
    """u54's consumers read the localCheckpointed ≤k+1-row rollup — the
    events scan and the rollup shuffle execute exactly once. A plain
    persist() is insufficient: union analysis re-IDs the rollup's
    virtual grouping attributes, the cache sameResult match fails for
    every branch after the first, and each silently re-scans the
    corpus (this test pins the checkpointed form)."""
    from gov_ec_pipeline_etl_spark.plans import all_queries

    q = all_queries()["u54_hll_merge"]
    df = q.spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ExistingRDD") >= 3, plan[:1200]
    assert plan.count("FileScan") == 0, plan[:1200]


def test_weighted_sample_is_distributed_topk(spark):
    """u58's global k-winner selection is a distributed TakeOrdered —
    a global ORDER BY materializing a full sort (or a single-partition
    ranking window over the corpus) is the regression; the ranking
    window runs on the k survivors only, after the limit."""
    plan = _plan(spark, "u58_weighted_sample")
    assert "TakeOrderedAndProject" in plan, plan[:800]


def test_trend_regression_moment_shuffles(spark):
    """u59: the corpus-scale work is the one (event_type, day)
    aggregate; the moments re-group is day-count-scale. Exactly two
    exchanges, one file scan, and every moment is a bigint sum (no
    float accumulation in the aggregate)."""
    plan = _plan(spark, "u59_trend_regression")
    assert plan.count("Exchange hashpartitioning") == 2, plan[:800]
    assert plan.count("FileScan") == 1
    assert "avg(" not in plan  # moments only; closed forms divide once


def test_zorder_audit_single_scan_single_agg(spark):
    """x64: the layout audit is one orders scan (plus the broadcast
    1-row bounds aggregate) feeding one multi-distinct aggregate —
    no per-layout re-scan, no join on the fact key."""
    plan = _plan(spark, "x64_zorder_layout")
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan[:800]
    assert "SortMergeJoin" not in plan
    # orders is scanned once for coords, once for the 1-row bounds agg
    assert plan.count("FileScan") == 2, plan[:800]


def test_k_anonymity_two_aggregations_one_scan(spark):
    """u60: QI group sizes then a group-of-groups — one data-scale
    exchange plus a group-cardinality-scale one, one column-pruned
    scan, no Python nodes."""
    plan = _plan(spark, "u60_k_anonymity")
    assert plan.count("Exchange hashpartitioning") == 2, plan[:800]
    assert plan.count("FileScan") == 1
    assert "pythonUDF" not in plan


def test_u65_quota_cap_uses_window_group_limit(spark):
    """The per-source quota must compile to WindowGroupLimit (map-side
    partial top-k) — a plain Window + Filter would ship every hot
    source's full history through the exchange, which is exactly what
    the cap exists to prevent at 100 TB."""
    plan = _plan(spark, "u65_source_quota_cap")
    assert "WindowGroupLimit" in plan, plan[:800]
    # the kept side joins broadcast (source-cardinality rows)
    assert "BroadcastHashJoin" in plan


def test_v09_cap_prepass_uses_window_group_limit(spark):
    """The v09 per-user cap pre-pass is rank<=k: it must compile to
    WindowGroupLimit so the hot key's history never crosses an
    exchange whole (the skew-gate mitigation contract)."""
    from gov_ec_pipeline_etl_spark.plans.util import T
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    events = T(spark, SF_SMOKE, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    capped = (
        events.where(F.col("event_type") == "click")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 8)
        .drop("__rn")
    )
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:800]


def test_u66_kmv_bottomk_is_window_group_limit(spark):
    """Both KMV bottom-k passes (per-type, per-pair-union) must compile
    to WindowGroupLimit — a full window sort would ship every audience
    through the exchange to keep 256 rows."""
    plan = _plan(spark, "u66_kmv_set_ops")
    assert plan.count("WindowGroupLimit") >= 2, plan[:800]
    assert "SortMergeJoin" not in plan


def test_u67_top10_is_take_ordered_not_window(spark):
    """u67's top-10 key mass must come from TakeOrdered (per-task
    partial top-k) — a bare rank window over the keys frame would
    single-task a billion keys at 100 TB."""
    plan = _plan(spark, "u67_skew_audit")
    assert "TakeOrderedAndProject" in plan, plan[:800]
    assert "Window" not in plan, plan[:800]


def test_schema_cache_invalidates_on_rewrite(spark, tmp_path):
    """A table REWRITTEN at the same path with a different schema must be
    read with the new schema (ADVICE r10: the bare-path cache key applied
    the stale schema silently, nulling the missing columns)."""
    import os
    import time

    from gov_ec_pipeline_etl_spark.tables import read_table

    d = str(tmp_path / "regen_sf")
    p = os.path.join(d, "documents.parquet")
    spark.createDataFrame([(1, "a")], "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(p)
    first = read_table(spark, d, "documents")
    assert set(first.columns) == {"doc_id", "text"}
    # mtime_ns resolution is filesystem-dependent; ensure the stamp moves
    time.sleep(0.05)
    spark.createDataFrame(
        [(1, "a", "en")], "doc_id bigint, text string, lang string"
    ).write.mode("overwrite").parquet(p)
    again = read_table(spark, d, "documents")
    assert set(again.columns) == {"doc_id", "text", "lang"}
    assert again.where("lang is not null").count() == 1
