"""Unit tests for the mining tier (u54–u56, x59–x60): interval
coalescing edge cases, incremental-maintenance algebra, basket-guard
semantics, HLL union accuracy, and the hierarchical backbone rank."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from gov_ec_pipeline_etl_spark.plans.mining_queries import (
    coalesce_intervals,
)


def test_interval_islands_containment_nesting(spark):
    """The running-max (not lag) semantics: a long interval [0, 100)
    followed by contained [10, 20) and [30, 40) then [90, 150) is ONE
    island even though consecutive-lag gaps exist; [200, 210) starts a
    new island; touching intervals ([150 end] vs [150 start]) merge
    (strict > break)."""
    iv = spark.createDataFrame(
        [
            (1, 0, 100),
            (1, 10, 20),
            (1, 30, 40),
            (1, 90, 150),
            (1, 150, 160),  # touching: s == running max end -> merges
            (1, 200, 210),
            (2, 5, 6),
        ],
        ["key", "s", "e"],
    )
    out = {
        (r["key"], r["island"]): (r["island_start_us"], r["island_end_us"], r["n"])
        for r in coalesce_intervals(iv).collect()
    }
    assert out == {
        (1, 1): (0, 160, 5),
        (1, 2): (200, 210, 1),
        (2, 1): (5, 6, 1),
    }


def test_incremental_agg_merge_handles_one_sided_groups(spark):
    """The full_outer ⊕ path: a group present only in the delta (or
    only in the base) must still reconcile with the recompute — the
    coalesce-to-zero algebra, exercised where sf data can't (all six
    TPC-H cells exist on both sides of the cut)."""
    from gov_ec_pipeline_etl_spark.plans.mining_queries import (
        u56_incremental_agg,
    )
    import os
    import tempfile

    rows = [
        # (returnflag, linestatus, qty, price, shipdate) — group ("A","X")
        # entirely before the 1997-01-01 cut, ("B","Y") entirely after,
        # ("C","Z") straddling
        ("A", "X", 1.0, 10.01, "1995-06-01"),
        ("A", "X", 2.0, 20.02, "1996-06-01"),
        ("B", "Y", 3.0, 30.03, "1997-06-01"),
        ("C", "Z", 4.0, 40.04, "1996-12-31"),
        ("C", "Z", 5.0, 50.05, "1997-01-01"),
    ]
    df = spark.createDataFrame(
        rows,
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "sd"],
    ).withColumn("l_shipdate", F.col("sd").cast("timestamp"))
    with tempfile.TemporaryDirectory() as d:
        df.drop("sd").write.parquet(os.path.join(d, "lineitem.parquet"))
        out = {
            (r["l_returnflag"], r["l_linestatus"]): r
            for r in u56_incremental_agg(spark, d).collect()
        }
    assert all(r["incremental_matches"] for r in out.values())
    assert out[("A", "X")]["n_rows"] == 2
    assert out[("A", "X")]["revenue_cents"] == 3003
    assert out[("B", "Y")]["sum_qty"] == 3
    assert out[("C", "Z")]["revenue_cents"] == 9009


def test_hll_union_bound_on_synthetic_cardinality(spark):
    """DataSketches HLL at lgConfigK=12 over 40k distinct ids split
    into 4 partitions-by-key: per-part sketches union-merged must land
    within 5% of the true cardinality (the claim u54 oracles), well
    past sparse mode so the dense estimator is what's being tested."""
    df = spark.range(40_000).select(
        (F.col("id") % 4).alias("part"), F.col("id").alias("uid")
    )
    sk = df.groupBy("part").agg(F.expr("hll_sketch_agg(uid, 12)").alias("sk"))
    est = sk.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk, false))").alias("e")
    ).collect()[0]["e"]
    assert abs(est - 40_000) <= 0.05 * 40_000


def test_market_basket_guard_and_handmath(spark):
    """The basket-size guard drops oversized baskets BEFORE marginals
    (so they don't skew supports), and confidence/lift match hand
    math on a 3-basket corpus."""
    import os
    import tempfile

    from gov_ec_pipeline_etl_spark.plans.mining_queries import (
        x59_market_basket,
    )

    # baskets: o1/o2/o5 {B1,B2}, o3 {B1,B3}, o4 = 65 distinct brands
    # (over the 64 guard -> dropped entirely); (B1,B2) support 3 passes
    # the >=3 support floor, (B1,B3) support 1 does not
    li, parts, pk = [], [], 0
    baskets = [
        (1, ["B1", "B2"]),
        (2, ["B1", "B2"]),
        (3, ["B1", "B3"]),
        (4, [f"Z{i:02d}" for i in range(65)]),
        (5, ["B1", "B2"]),
    ]
    for o, brands in baskets:
        for b in brands:
            li.append((o, pk))
            parts.append((pk, b))
            pk += 1
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(li, ["l_orderkey", "l_partkey"]).write.parquet(
            os.path.join(d, "lineitem.parquet")
        )
        spark.createDataFrame(parts, ["p_partkey", "p_brand"]).write.parquet(
            os.path.join(d, "part.parquet")
        )
        rows = {
            (r["brand_a"], r["brand_b"]): r
            for r in x59_market_basket(spark, d).collect()
        }
    # guarded basket 4 dropped: n_orders=4, B1 in 4, B2 in 3, (B1,B2) in 3
    assert set(rows) == {("B1", "B2")}
    r = rows[("B1", "B2")]
    assert r["support"] == 3
    assert r["confidence"] == 0.75  # 3/4
    assert r["lift"] == 1.0  # 3*4/(4*3)


def test_backbone_hierarchical_rank_equals_global_rank(spark):
    """x60's bucketed (weight-offset + within-weight row_number) rank
    must reproduce the plain global ROW_NUMBER(weight DESC, s1, s2)
    that the oracle runs — on a table with heavy weight ties."""
    pw = spark.createDataFrame(
        [(a, b, (a * 7 + b) % 5 + 1) for a in range(1, 30) for b in range(a + 1, 30)],
        ["s1", "s2", "weight"],
    )
    plain = pw.withColumn(
        "rk",
        F.row_number().over(Window.orderBy(F.desc("weight"), "s1", "s2")),
    )
    bn = pw.groupBy("weight").agg(F.count(F.lit(1)).alias("bn"))
    wb = Window.orderBy(F.desc("weight"))
    offs = bn.select(
        "weight",
        F.coalesce(
            F.sum("bn").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("off"),
    )
    win_w = Window.partitionBy("weight").orderBy("s1", "s2")
    hier = (
        pw.withColumn("rn", F.row_number().over(win_w))
        .join(F.broadcast(offs), "weight")
        .select("s1", "s2", (F.col("off") + F.col("rn")).alias("rk"))
    )
    a = {(r["s1"], r["s2"]): r["rk"] for r in plain.collect()}
    b = {(r["s1"], r["s2"]): r["rk"] for r in hier.collect()}
    assert a == b


def test_scd2_run_collapse_handmath(spark):
    """SCD2 run detection: A,A,B,A per user -> three versions (the
    second A run is a NEW version, not merged with the first), open
    interval sentinel -1 only on the last, n_events counts the run."""
    import os
    import tempfile

    rows = [
        (1, "2024-01-01 00:00:00", 10, "A", 1.0, "{}"),
        (2, "2024-01-01 01:00:00", 10, "A", 1.0, "{}"),
        (3, "2024-01-01 02:00:00", 10, "B", 1.0, "{}"),
        (4, "2024-01-01 03:00:00", 10, "A", 1.0, "{}"),
    ]
    df = (
        spark.createDataFrame(
            rows, ["event_id", "ts_s", "user_id", "event_type", "value", "props"]
        )
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
        .drop("ts_s")
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        from gov_ec_pipeline_etl_spark.plans.mining_queries import (
            x63_scd2_build,
        )

        out = sorted(
            (r["version"], r["state"], r["is_current"], r["n_events"])
            for r in x63_scd2_build(spark, d).collect()
        )
    assert out == [(1, "A", False, 2), (2, "B", False, 1), (3, "A", True, 1)]


def test_markov_rows_are_stochastic(spark):
    """Transition probabilities are row-substochastic after 6dp floor
    quantization (sum in (1-5e-6, 1])."""
    from tests.conftest import SF_SMOKE

    from gov_ec_pipeline_etl_spark.plans.mining_queries import (
        x61_markov_transitions,
    )

    rows = x61_markov_transitions(spark, SF_SMOKE).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["event_type"], 0.0)
        by_src[r["event_type"]] += r["prob"]
    for src, tot in by_src.items():
        assert 1 - 5e-6 < tot <= 1.0 + 1e-12, (src, tot)


def test_ivm_store_lifecycle(spark, tmp_path):
    """operators/ivm end-to-end: init from a base split, apply two
    deltas, verify cell-for-cell against the full recompute; a
    REPLAYED batch id is a recorded no-op (at-least-once safety), and
    verify flips to not-ok when the store is behind the corpus."""
    import pyspark.sql.functions as F2

    from gov_ec_pipeline_etl_spark.operators import ivm

    full = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    cut1 = F2.lit("1996-01-01").cast("timestamp")
    cut2 = F2.lit("1997-06-01").cast("timestamp")
    base = full.where(F2.col("l_shipdate") < cut1)
    d1 = full.where((F2.col("l_shipdate") >= cut1) & (F2.col("l_shipdate") < cut2))
    d2 = full.where(F2.col("l_shipdate") >= cut2)

    store = str(tmp_path / "agg_store")
    keys = ["l_returnflag", "l_linestatus"]
    sums = {"sum_qty": "l_quantity"}
    ivm.init_store(spark, base, store, keys, sums)

    ivm.apply_delta(spark, d1, store, "b1")
    mid = ivm.verify_store(spark, full, store)
    assert not mid["ok"]  # d2 not applied yet — verify must catch it

    meta = ivm.apply_delta(spark, d2, store, "b2")
    assert meta["current"] == 3 and meta["applied"] == ["b1", "b2"]
    done = ivm.verify_store(spark, full, store)
    assert done["ok"], done

    # replay: ledgered no-op — same snapshot version, still consistent
    replay = ivm.apply_delta(spark, d2, store, "b2")
    assert replay.get("replayed") == "b2" and replay["current"] == 3
    assert ivm.verify_store(spark, full, store)["ok"]


def test_ivm_cli_wiring(spark, tmp_path, capsys):
    """The cli ivm subcommand drives the same lifecycle."""
    import json as _json

    from gov_ec_pipeline_etl_spark.cli import main as cli_main

    li = "/root/testdata/sf0.001/lineitem.parquet"
    store = str(tmp_path / "cli_store")
    assert cli_main(["ivm", "init", store, li]) == 0
    assert cli_main(["ivm", "verify", store, li]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    res = _json.loads(out[-1])
    assert res["ok"] and res["mismatched_cells"] == 0
    # omitting the data path is a usage error (exit 2), not a traceback
    for action in ("init", "apply", "verify"):
        assert cli_main(["ivm", action, store]) == 2
    assert "requires a data path" in capsys.readouterr().err


def test_time_rollup_grain_consistency(spark):
    """Internal additivity of x62's grains at smoke scale: per event
    type, the hour cells sum to each day cell, the day cells sum to
    the total cell — the property that makes the view incrementally
    refreshable per grain."""
    from collections import defaultdict

    from tests.conftest import SF_SMOKE

    from gov_ec_pipeline_etl_spark.plans.mining_queries import (
        x62_time_rollup,
    )

    rows = x62_time_rollup(spark, SF_SMOKE).collect()
    day_from_hours = defaultdict(int)
    tot_from_days = defaultdict(int)
    days, totals = {}, {}
    for r in rows:
        if r["grain"] == "hour":
            day_from_hours[(r["event_type"], r["day_us"])] += r["value_cents"]
        elif r["grain"] == "day":
            days[(r["event_type"], r["day_us"])] = r["value_cents"]
            tot_from_days[r["event_type"]] += r["value_cents"]
        else:
            totals[r["event_type"]] = r["value_cents"]
    assert days == dict(day_from_hours)
    assert totals == dict(tot_from_days)


def test_markov_tiny_sequence_handmath(spark, tmp_path):
    """x61 on a hand-computed sequence: user 1 A->B->A, user 2 A->B.
    Pairs: A->B x2, B->A x1; rows are normalized by OUTGOING mass, so
    P(B|A) = 2/2 = 1.0 and P(A|B) = 1/1 = 1.0."""
    import os

    rows = [
        (1, "2024-01-01 00:00:00", 1, "A", 0.0, "{}"),
        (2, "2024-01-01 00:01:00", 1, "B", 0.0, "{}"),
        (3, "2024-01-01 00:02:00", 1, "A", 0.0, "{}"),
        (4, "2024-01-01 00:00:00", 2, "A", 0.0, "{}"),
        (5, "2024-01-01 00:01:00", 2, "B", 0.0, "{}"),
    ]
    df = (
        spark.createDataFrame(
            rows, ["event_id", "ts_s", "user_id", "event_type", "value", "props"]
        )
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
        .drop("ts_s")
    )
    d = str(tmp_path)
    df.write.parquet(os.path.join(d, "events.parquet"))
    from gov_ec_pipeline_etl_spark.plans.mining_queries import (
        x61_markov_transitions,
    )

    out = {
        (r["event_type"], r["next_type"]): (r["n"], r["prob"])
        for r in x61_markov_transitions(spark, d).collect()
    }
    assert out == {("A", "B"): (2, 1.0), ("B", "A"): (1, 1.0)}


def test_interval_islands_duplicate_interval_ties(spark):
    """sf1 full-gate root-cause regression (round 5): two IDENTICAL
    intervals (a customer ordering twice in one day) after a real gap.
    The break-flag and running-sum windows must see the tied rows in
    ONE order — without a unique tiebreak in the window ORDER BY, an
    engine that orders tied peers independently per window (DuckDB's
    parallel window operator does) merges the island across the gap
    AND splits the true island. Hand-computed islands pinned."""
    from gov_ec_pipeline_etl_spark.plans.mining_queries import (
        coalesce_intervals,
    )

    rows = [  # (key, tb, s, e): gap between e=10 and the s=20 twins
        (1, 101, 0, 10),
        (1, 102, 20, 30),
        (1, 103, 20, 30),
        (1, 104, 31, 40),
    ]
    iv = spark.createDataFrame(rows, ["key", "tb", "s", "e"])
    out = {
        (r.island, r.island_start_us, r.island_end_us, r.n)
        for r in coalesce_intervals(iv, tiebreak="tb").collect()
    }
    assert out == {(1, 0, 10, 1), (2, 20, 30, 2), (3, 31, 40, 1)}
