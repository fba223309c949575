"""Every registered query with an oracle must match DuckDB — the local
replica of the driver's t2 correctness gate (sf0.001 for speed; the
``python -m gov_ec_pipeline_etl_spark.oracle`` CLI covers sf0.01)."""

from __future__ import annotations

import pytest

from gov_ec_pipeline_etl_spark.oracle import compare, duckdb_connection
from gov_ec_pipeline_etl_spark.plans import all_queries
from gov_ec_pipeline_etl_spark.plans.registry import oracle_text
from tests.conftest import SF_SMOKE

QUERIES = sorted(all_queries().items())


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", [n for n, q in QUERIES if q.oracle is not None])
def test_oracle_parity(spark, duck, name):
    q = all_queries()[name]
    ok, msg = compare(q.spark(spark, SF_SMOKE), oracle_text(q, SF_SMOKE), SF_SMOKE, duck)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", [n for n, q in QUERIES if q.oracle is None])
def test_rows_only_queries_run(spark, name):
    q = all_queries()[name]
    df = q.spark(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 19


def test_driver_window_frozen():
    """The first 50 registered names (alphabetical) must be exactly the
    frozen driver recording window; any new query must sort after it.
    register() enforces this at registration time — this test proves the
    invariant holds over the full import surface."""
    from gov_ec_pipeline_etl_spark.plans.registry import (
        DRIVER_WINDOW,
        all_queries,
        register,
    )

    names = sorted(all_queries())
    assert set(names[:50]) == set(DRIVER_WINDOW)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="driver recording window"):
        register("e99_bad_name", None)(lambda spark, sf: None)


def test_fast_compare_large_results():
    """The vectorized large-result compare must agree with the row-tuple
    canonicalizer's semantics: order-insensitive equality, -0.0 == 0.0,
    NaN == NaN, dtype-width tolerance — and still catch real value and
    ordering-sensitive differences."""
    import numpy as np
    import pandas as pd

    from gov_ec_pipeline_etl_spark.oracle import _fast_compare

    a = pd.DataFrame(
        {"k": [1, 2, 3], "v": [0.0, np.nan, 1.5], "s": ["x", "y", "z"]}
    )
    # same rows, different order, -0.0, int32 key
    b = pd.DataFrame(
        {
            "k": np.array([3, 1, 2], dtype=np.int32),
            "v": [1.5, -0.0, np.nan],
            "s": ["z", "x", "y"],
        }
    )
    ok, msg = _fast_compare(a, b, ["k", "s", "v"])
    assert ok, msg

    bad = b.copy()
    bad.loc[0, "v"] = 1.5000001
    ok, msg = _fast_compare(a, bad, ["k", "s", "v"])
    assert not ok and "v" in msg

    # same row COUNT but one row duplicated in place of another
    dup = a.iloc[[0, 1, 1]].reset_index(drop=True)
    ok, _ = _fast_compare(dup, a, ["k", "s", "v"])
    assert not ok

    # ADVICE r4: an int64 Spark column vs a NON-INTEGRAL float64 DuckDB
    # column must not be truncated to a false 'ok' — coerce toward the
    # wider type and compare as float
    si = pd.DataFrame({"k": [1, 2], "v": np.array([1, 2], dtype=np.int64)})
    df_ = pd.DataFrame({"k": [1, 2], "v": np.array([1.5, 2.0])})
    ok, msg = _fast_compare(si, df_, ["k", "v"])
    assert not ok and "v" in msg, msg
    # ...while a genuinely integral float column still compares equal
    ok, msg = _fast_compare(si, pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]}), ["k", "v"])
    assert ok, msg
    # non-numeric lossy coercions are rejected, not silently cast
    ss = pd.DataFrame({"k": [1, 2], "v": ["1", "2"]})
    sv = pd.DataFrame({"k": [1, 2], "v": [1, 2]})
    ok, msg = _fast_compare(ss, sv, ["k", "v"])
    assert ok or "v" in msg  # either lossless-equal or named rejection

    # ADVICE r9: a row-COUNT mismatch must short-circuit with a count
    # message, not name every column
    ok, msg = _fast_compare(a, a.iloc[:2], ["k", "s", "v"])
    assert not ok and "row count mismatch" in msg, msg


def test_mut_id_guard_fails_loudly():
    """ADVICE r9: a fixture id >= 2*mut_offset (proof that a base id
    crossed the offset) must raise instead of silently classifying the
    base as a mutant while the SQL oracle generates it as a base."""
    import pytest as _pytest

    from gov_ec_pipeline_etl_spark.operators.multimodal import _check_mut_id

    _check_mut_id(1_999_999, 1_000_000)  # genuine mutant range: fine
    _check_mut_id(5, None)  # no planted mutants: fine
    with _pytest.raises(ValueError, match="crossed mut_offset"):
        _check_mut_id(2_000_000, 1_000_000)


def test_list_valued_columns_still_rejected():
    """The r9 dtype guard on the non-scalar detector (numeric dtypes
    cannot hold lists — the unconditional per-value map cost ~285 s of
    d03's 130 M-row sf1 entry) must not weaken the round-1 m03 trap:
    object columns carrying lists are still rejected."""
    import duckdb
    import pandas as pd

    from gov_ec_pipeline_etl_spark.oracle import compare

    class FakeDF:
        def __init__(self, pdf):
            self._p = pdf

        def toPandas(self):
            return self._p

    con = duckdb.connect()
    try:
        bad = FakeDF(pd.DataFrame({"k": [1, 2], "v": [[1, 2], [3]]}))
        ok, msg = compare(
            bad, "SELECT 1 AS k, 2 AS v UNION ALL SELECT 2, 3", ".", con
        )
        assert not ok and "non-scalar" in msg
    finally:
        con.close()


def test_row_hash_multiset_properties():
    """The r9 gate comparator replaces the pandas frame sort with
    multiset equality of vectorized row hashes — these are the
    properties the swap relies on: swapping values BETWEEN columns
    changes the row hash, null spellings hash alike (None == NaN, the
    slow path's _canon_value equivalence), and reordering rows leaves
    the multiset unchanged."""
    import numpy as np
    import pandas as pd

    from gov_ec_pipeline_etl_spark.oracle import _row_hashes

    # identical per-column multisets ({1,2} in both columns) but
    # different row pairings: {(1,1),(2,2)} vs {(1,2),(2,1)}
    a = {"x": pd.Series([1, 2]), "y": pd.Series([1, 2])}
    swapped = {"x": pd.Series([1, 2]), "y": pd.Series([2, 1])}
    ha, hb = _row_hashes(a), _row_hashes(swapped)
    assert sorted(ha.tolist()) != sorted(hb.tolist())

    o1 = {"s": pd.Series(["p", None, "q"], dtype=object)}
    o2 = {"s": pd.Series(["p", np.nan, "q"], dtype=object)}
    assert _row_hashes(o1).tolist() == _row_hashes(o2).tolist()

    base = {"k": pd.Series([1, 2, 3]), "v": pd.Series([1.5, 0.25, -1.0])}
    perm = {
        "k": pd.Series([3, 1, 2]),
        "v": pd.Series([-1.0, 1.5, 0.25]),
    }
    assert sorted(_row_hashes(base).tolist()) == sorted(_row_hashes(perm).tolist())


def test_tie_sensitive_queries_parity_on_planted_ties(spark, tmp_path):
    """Adversarial tie data for every query whose window logic is
    positional: users with DUPLICATE event timestamps and customers
    with duplicate order dates straddling real gaps — the exact shape
    that made u55 flake the sf1 gate. Spark and DuckDB must hash-agree
    on all five; if anyone drops a tiebreak from either side, this
    fails deterministically instead of once per sf1 full-gate run."""
    import os

    from gov_ec_pipeline_etl_spark.oracle import compare, duckdb_connection
    from gov_ec_pipeline_etl_spark.plans import all_queries
    from gov_ec_pipeline_etl_spark.plans.registry import oracle_text
    from gov_ec_pipeline_etl_spark.tables import TABLES
    from tests.conftest import SF_SMOKE

    d = str(tmp_path / "ties")
    os.makedirs(d)
    ts = "2024-03-01 12:00:00"
    ts2 = "2024-03-01 12:02:00"
    far = "2024-07-01 09:30:00"
    ev = []
    eid = 0
    for u in (1, 2, 3):
        for t, et, v in [
            (ts, "view", 10.0), (ts, "click", 20.0),  # duplicate ts
            (ts, "view", 30.0),                        # triple tie
            (ts2, "purchase", 40.0),
            (far, "view", 50.0), (far, "error", 60.0),  # tied after gap
        ]:
            eid += 1
            ev.append((eid, t, u, et, v, "{}"))
    import pandas as pd

    # single-file parquet with naive TIMESTAMP(us), matching the
    # driver-generated testdata physical (read_table normalizes it)
    edf = pd.DataFrame(
        ev, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    edf["ts"] = pd.to_datetime(edf["ts"]).astype("datetime64[us]")
    edf.to_parquet(os.path.join(d, "events.parquet"), index=False)
    orders = []
    for c in (1, 2):
        for i, day in enumerate(
            ["1995-01-01", "1995-01-10", "1995-01-10",  # duplicate date
             "1995-06-01", "1995-06-01"]                 # tied after gap
        ):
            orders.append((c * 100 + i, c, "O", 100.0 + i, day, "1-URGENT"))
    odf = pd.DataFrame(
        orders, columns=["o_orderkey", "o_custkey", "o_orderstatus",
                         "o_totalprice", "o_orderdate", "o_orderpriority"]
    )
    odf["o_orderdate"] = pd.to_datetime(odf["o_orderdate"]).astype("datetime64[us]")
    odf.to_parquet(os.path.join(d, "orders.parquet"), index=False)
    for t in TABLES:
        p = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(p):
            os.symlink(os.path.join(SF_SMOKE, f"{t}.parquet"), p)

    q = all_queries()
    con = duckdb_connection(d)
    try:
        for name in (
            "u55_interval_islands",
            "x55_sessionize",
            "x63_scd2_build",
            "st02_session_window",
            "r10_contract_end_to_end",
        ):
            ok, msg = compare(
                q[name].spark(spark, d), oracle_text(q[name], d), d, con
            )
            assert ok, f"{name}: {msg}"
    finally:
        con.close()
