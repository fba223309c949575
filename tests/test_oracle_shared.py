"""Shared-oracle-fragment memoization (the skew-gate cost fix, VERDICT
r7 #2): the local gate substitutes registered fragments appearing
verbatim inside oracle texts with per-connection temp tables. The
substitution must be result-identical to the standalone text for EVERY
affected oracle — this runs both forms on the same DuckDB connection
family at sf0.001 and diffs them, no Spark involved.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

# skip (not error) on a checkout without generated fixtures (ADVICE r8)
pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"fixture dir {SF_DIR} absent"
)


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    return (
        pdf[cols]
        .sort_values(cols, kind="mergesort")
        .reset_index(drop=True)
    )


def test_fragments_registered():
    from gov_ec_pipeline_etl_spark.plans.registry import shared_fragments

    frags = shared_fragments()
    assert {"minhash_sig12", "minhash_pairs"} <= set(frags)
    # nesting: the pair replay embeds the sketch select verbatim
    assert frags["minhash_sig12"] in frags["minhash_pairs"]


def test_rewrite_is_result_identical_for_every_affected_oracle():
    from gov_ec_pipeline_etl_spark.oracle import (
        duckdb_connection,
        rewrite_shared_oracle,
    )
    from gov_ec_pipeline_etl_spark.plans import all_queries
    from gov_ec_pipeline_etl_spark.plans.registry import (
        oracle_text,
        shared_fragments,
    )

    frags = shared_fragments()
    affected = []
    for name, q in sorted(all_queries().items()):
        sql = oracle_text(q, SF_DIR)
        if sql and any(f in sql for f in frags.values()):
            affected.append((name, sql))
    # the fragment machinery must actually cover the expensive family
    names = {n for n, _ in affected}
    assert {
        "d02_minhash_lsh", "u20_minhash_estimate_error",
        "u29_split_leakage_check", "u35_curation_funnel",
    } <= names, names

    con = duckdb_connection(SF_DIR)
    created: set[str] = set()
    try:
        for name, sql in affected:
            rewritten = rewrite_shared_oracle(sql, con, created)
            assert rewritten != sql, f"{name}: no substitution happened"
            raw = _canon(con.execute(sql).fetchdf())
            new = _canon(con.execute(rewritten).fetchdf())
            pd.testing.assert_frame_equal(raw, new, check_dtype=False)
    finally:
        con.close()
    assert created == set(frags), created  # every fragment materialized


def test_u20_fragment_form_equals_full_replay():
    """r9 rewrote u20's oracle from a full band-join + shingle-intersect
    replay to a join against the d02 fragments (the r8 skewed gate spent
    205 s on the replay). Both standalone texts must produce identical
    results — the retired replay form is kept, unregistered, exactly for
    this check."""
    from gov_ec_pipeline_etl_spark.oracle import duckdb_connection
    from gov_ec_pipeline_etl_spark.plans.dedup_queries import (
        _minhash_err_oracle,
        _minhash_err_oracle_replay,
    )

    con = duckdb_connection(SF_DIR)
    try:
        new = _canon(con.execute(_minhash_err_oracle()).fetchdf())
        old = _canon(con.execute(_minhash_err_oracle_replay()).fetchdf())
        pd.testing.assert_frame_equal(old, new, check_dtype=False)
        assert len(new) > 0  # planted near-dups guarantee a non-empty check
    finally:
        con.close()


def test_every_fragment_occurrence_is_parenthesized():
    """The gate rewrite is blind str.replace, so the registration
    contract (see register_shared_fragment) requires every occurrence
    of a fragment inside any oracle to sit alone inside parentheses —
    `AS ( <fragment> )` / `FROM ( <fragment> )`. This walks every
    registered oracle so a future oracle embedding a fragment in a
    string literal, comment, or expression position fails loudly here
    instead of being silently rewritten into wrong SQL (ADVICE r8)."""
    from gov_ec_pipeline_etl_spark.plans import all_queries
    from gov_ec_pipeline_etl_spark.plans.registry import (
        oracle_text,
        shared_fragments,
    )

    frags = shared_fragments()
    texts = {"fragment " + n: f for n, f in frags.items()}
    for name, q in sorted(all_queries().items()):
        sql = oracle_text(q, SF_DIR)
        if sql:
            texts["oracle " + name] = sql
    checked = 0
    for where, sql in texts.items():
        for fname, frag in frags.items():
            if where == "fragment " + fname:
                continue  # a fragment's own definition is the SELECT itself
            start = 0
            while (i := sql.find(frag, start)) != -1:
                start = i + len(frag)
                before = sql[:i].rstrip()
                after = sql[i + len(frag):].lstrip()
                if not before and not after:
                    checked += 1  # oracle IS the fragment (d02) — whole-text swap
                    continue
                assert before.endswith("(") and after.startswith(")"), (
                    f"{where}: fragment {fname} occurs outside a "
                    f"parenthesized standalone subquery (…{before[-30:]!r} "
                    f"/ {after[:30]!r}…) — see register_shared_fragment"
                )
                checked += 1
    assert checked >= 4, checked  # sig-in-pairs + u20/u29/u35 at minimum


def test_rewrite_noop_without_fragment():
    from gov_ec_pipeline_etl_spark.oracle import (
        duckdb_connection,
        rewrite_shared_oracle,
    )

    con = duckdb_connection(SF_DIR)
    try:
        created: set[str] = set()
        sql = "SELECT COUNT(*) AS n FROM documents"
        assert rewrite_shared_oracle(sql, con, created) == sql
        assert rewrite_shared_oracle(None, con, created) is None
        assert not created
    finally:
        con.close()
