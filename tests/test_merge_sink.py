"""Gate for the database-target MERGE path (reference load.py:387-441).

SQLite is the in-container stand-in for the production JDBC/Postgres
target: a real file database, real ON CONFLICT resolution, real
concurrent partition writers (serialized by the database lock, absorbed
by the retry/backoff loop) — the same execution shape as
``df.write.jdbc``-staging + target-side MERGE, minus the driver jar.
"""

from __future__ import annotations

import sqlite3

import pytest

from gov_ec_pipeline_etl_spark.sinks.merge_sql import (
    merge_upsert_sql,
    sqlite_connect_factory,
    upsert_dbapi,
    write_batches,
)


def test_merge_sql_dialects():
    sql = merge_upsert_sql("t", ["k", "a", "b"], "k", "sqlite")
    assert sql == (
        "INSERT INTO t (k, a, b) VALUES (?, ?, ?) "
        "ON CONFLICT (k) DO UPDATE SET a = excluded.a, b = excluded.b"
    )
    pg = merge_upsert_sql("t", ["k", "a"], "k", "postgres")
    assert "%s" in pg and "excluded.a" in pg
    ansi = merge_upsert_sql("t", ["k", "a"], "k", "ansi")
    assert ansi.startswith("MERGE INTO t t USING")
    assert "WHEN MATCHED THEN UPDATE SET t.a = s.a" in ansi
    assert "WHEN NOT MATCHED THEN INSERT (k, a) VALUES (s.k, s.a)" in ansi
    # key-only table: conflict resolution degrades to DO NOTHING
    assert merge_upsert_sql("t", ["k"], "k", "sqlite").endswith("DO NOTHING")
    with pytest.raises(ValueError):
        merge_upsert_sql("t", ["a"], "k", "sqlite")
    with pytest.raises(ValueError):
        merge_upsert_sql("t", ["k"], "k", "oracle-12c")


def test_upsert_dbapi_end_to_end(spark, tmp_path):
    """Distributed upsert into SQLite: insert, update, idempotency —
    across 4 concurrent partition writers."""
    db = str(tmp_path / "target.db")
    with sqlite3.connect(db) as con:
        con.execute(
            "CREATE TABLE detenidos (surrogate_id TEXT PRIMARY KEY, "
            "ano INTEGER, total REAL)"
        )
    connect = sqlite_connect_factory(db)

    df = spark.createDataFrame(
        [(f"k{i}", 2020 + i % 3, float(i)) for i in range(200)],
        "surrogate_id: string, ano: int, total: double",
    ).repartition(4)
    upsert_dbapi(df, connect, "detenidos", "surrogate_id", batch_size=16)
    with sqlite3.connect(db) as con:
        assert con.execute("SELECT COUNT(*) FROM detenidos").fetchone()[0] == 200

    # re-running the same load must be a no-op (idempotent MERGE), and a
    # changed row must update in place without duplicating the key
    df2 = spark.createDataFrame(
        [("k0", 2020, 999.0)], "surrogate_id: string, ano: int, total: double"
    )
    upsert_dbapi(df2, connect, "detenidos", "surrogate_id")
    upsert_dbapi(df2, connect, "detenidos", "surrogate_id")
    with sqlite3.connect(db) as con:
        n, total = con.execute(
            "SELECT COUNT(*), SUM(total = 999.0) FROM detenidos"
        ).fetchone()
        assert (n, total) == (200, 1)


class _FlakyCursor:
    """Fails any batch larger than ``fail_over`` rows ``fails`` times,
    then succeeds — exercising retry and shrink independently."""

    def __init__(self, fail_over: int = 10**9, fails_per_batch: int = 0):
        self.rows: list[tuple] = []
        self.fail_over = fail_over
        self._fails_left: dict[int, int] = {}
        self.fails_per_batch = fails_per_batch

    def executemany(self, sql: str, batch: list[tuple]) -> None:
        if len(batch) > self.fail_over:
            raise RuntimeError("batch too large for flaky target")
        key = id(batch)
        left = self._fails_left.setdefault(key, self.fails_per_batch)
        if left > 0:
            self._fails_left[key] = left - 1
            raise RuntimeError("transient")
        self.rows.extend(batch)


def test_write_batches_shrinks_and_retries():
    rows = [(i,) for i in range(100)]
    # transient failures: same batch succeeds on retry
    cur = _FlakyCursor(fails_per_batch=2)
    n = write_batches(cur, "sql", rows, batch_size=25, sleep=lambda _s: None)
    assert n == 100 and cur.rows == rows
    # oversized batches: halved until the target accepts them, order kept
    cur = _FlakyCursor(fail_over=7)
    n = write_batches(cur, "sql", rows, batch_size=50, sleep=lambda _s: None)
    assert n == 100 and cur.rows == rows


def test_write_batches_poison_row_isolated():
    class PoisonCursor(_FlakyCursor):
        def executemany(self, sql: str, batch: list[tuple]) -> None:
            if any(r[0] == 13 for r in batch):
                raise RuntimeError("constraint violation")
            self.rows.extend(batch)

    cur = PoisonCursor()
    rows = [(i,) for i in range(20)]
    with pytest.raises(RuntimeError, match=r"row rejected.*\(13,\)"):
        write_batches(cur, "sql", rows, batch_size=20, sleep=lambda _s: None)
    # every non-poison row before the failure was still delivered
    assert (13,) not in cur.rows and (12,) in cur.rows


def test_write_batches_property_random_failures():
    """Property: regardless of which batches transiently fail or which
    sizes the target rejects, every row is delivered exactly once and in
    order (ON CONFLICT idempotency covers retried duplicates at the DB
    layer; the splitter itself must not lose, duplicate, or reorder)."""
    import random

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        n_rows=st.integers(0, 200),
        batch_size=st.integers(1, 64),
        fail_over=st.integers(1, 64),
        seed=st.integers(0, 10_000),
    )
    def run(n_rows, batch_size, fail_over, seed):
        rng = random.Random(seed)

        class Flaky:
            def __init__(self):
                self.rows = []

            def executemany(self, sql, batch):
                if len(batch) > fail_over or rng.random() < 0.2:
                    raise RuntimeError("transient")
                self.rows.extend(batch)

        cur = Flaky()
        rows = [(i,) for i in range(n_rows)]
        n = write_batches(
            cur, "sql", rows, batch_size=batch_size, max_retries=8,
            sleep=lambda _s: None,
        )
        assert n == n_rows
        assert cur.rows == rows  # complete, deduplicated, ordered

    run()


def test_merge_sql_golden_statements():
    """Exact golden statements per dialect (VERDICT r2 #4): the postgres
    and ansi generators are asserted verbatim so a regression in either
    can't hide behind the SQLite-only end-to-end gate."""
    assert merge_upsert_sql("t", ["k", "a", "b"], "k", "postgres") == (
        "INSERT INTO t (k, a, b) VALUES (%s, %s, %s) "
        "ON CONFLICT (k) DO UPDATE SET a = excluded.a, b = excluded.b"
    )
    assert merge_upsert_sql("t", ["k", "a"], "k", "ansi") == (
        "MERGE INTO t t USING (SELECT ? AS k, ? AS a) s "
        "ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET t.a = s.a "
        "WHEN NOT MATCHED THEN INSERT (k, a) VALUES (s.k, s.a)"
    )
    # paramstyle is a driver property, orthogonal to the dialect
    assert merge_upsert_sql(
        "t", ["k", "a"], "k", "postgres", paramstyle="qmark"
    ).startswith("INSERT INTO t (k, a) VALUES (?, ?) ON CONFLICT")
    with pytest.raises(ValueError, match="paramstyle"):
        merge_upsert_sql("t", ["k"], "k", "sqlite", paramstyle="numeric")


def test_upsert_dbapi_postgres_dialect_against_duckdb(spark, tmp_path):
    """Second-ENGINE gate for the postgres dialect (VERDICT r2 #4):
    DuckDB's parser is Postgres-derived, so the postgres ON CONFLICT
    statement (through the qmark paramstyle its Python driver uses) is
    executed end-to-end — insert, update, idempotency — not just
    string-asserted. coalesce(1) because DuckDB is single-writer across
    processes (no SQLite-style busy-timeout handshake)."""
    import duckdb

    from gov_ec_pipeline_etl_spark.sinks.merge_sql import duckdb_connect_factory

    db = str(tmp_path / "target.duckdb")
    con = duckdb.connect(db)
    con.execute(
        "CREATE TABLE detenidos (surrogate_id TEXT PRIMARY KEY, "
        "ano INTEGER, total DOUBLE)"
    )
    con.close()
    connect = duckdb_connect_factory(db)

    df = spark.createDataFrame(
        [(f"k{i}", 2020 + i % 3, float(i)) for i in range(100)],
        "surrogate_id: string, ano: int, total: double",
    ).coalesce(1)
    upsert_dbapi(
        df, connect, "detenidos", "surrogate_id",
        dialect="postgres", paramstyle="qmark", batch_size=16,
    )
    df2 = spark.createDataFrame(
        [("k0", 2020, 999.0)], "surrogate_id: string, ano: int, total: double"
    )
    for _ in range(2):  # idempotent
        upsert_dbapi(
            df2, connect, "detenidos", "surrogate_id",
            dialect="postgres", paramstyle="qmark",
        )
    con = duckdb.connect(db)
    n, updated = con.execute(
        "SELECT COUNT(*), SUM(CASE WHEN total = 999.0 THEN 1 ELSE 0 END) "
        "FROM detenidos"
    ).fetchone()
    con.close()
    assert (n, updated) == (100, 1)


def test_snapshot_history_and_changes_cli(spark, tmp_path, capsys):
    """Snapshot inspection + CDC diff of the last merge, driven through
    the CLI: first load reports all-inserted; a second merge that
    updates one row, inserts one, and leaves one untouched reports
    exactly {inserted:1, changed:1, deleted:0}; history shows the
    current + previous snapshot pair the deferred GC keeps."""
    import json as _json

    from gov_ec_pipeline_etl_spark.cli import main
    from gov_ec_pipeline_etl_spark.sinks.upsert import (
        snapshot_changes,
        upsert_parquet,
    )

    target = str(tmp_path / "tbl")
    df1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "surrogate_id int, v string"
    )
    upsert_parquet(spark, df1, target)

    # first load: no previous snapshot -> everything is 'inserted'
    ch0 = {
        (r.surrogate_id, r.change_type)
        for r in snapshot_changes(spark, target).collect()
    }
    assert ch0 == {(1, "inserted"), (2, "inserted"), (3, "inserted")}

    df2 = spark.createDataFrame(
        [(2, "B"), (4, "d")], "surrogate_id int, v string"
    )
    upsert_parquet(spark, df2, target)

    assert main(["table", "history", target]) == 0
    hist = _json.loads(capsys.readouterr().out.strip())
    assert len(hist) == 2 and sum(h["current"] for h in hist) == 1

    assert main(["table", "changes", target]) == 0
    counts = _json.loads(capsys.readouterr().out.strip())
    assert counts == {"inserted": 1, "changed": 1, "deleted": 0}

    rows = {
        (r.surrogate_id, r.change_type)
        for r in snapshot_changes(spark, target).collect()
    }
    assert rows == {(4, "inserted"), (2, "changed")}


def test_snapshot_changes_partitioned_and_compaction_silent(spark, tmp_path):
    """CDC diff on a PARTITION-SCOPED merge target: only the touched
    rows report; a compaction (rows moved between files, never changed)
    reports an EMPTY diff — the 'results bit-identical across
    compaction' contract read off the storage layout itself."""
    from gov_ec_pipeline_etl_spark.sinks.upsert import (
        compact_partitions,
        snapshot_changes,
        upsert_parquet,
    )

    target = str(tmp_path / "tbl")
    df1 = spark.createDataFrame(
        [(1, 2023, "a"), (2, 2023, "b"), (3, 2024, "c")],
        "surrogate_id int, ano int, v string",
    )
    upsert_parquet(spark, df1, target, partition_by=["ano"])
    df2 = spark.createDataFrame(
        [(3, 2024, "C"), (4, 2024, "d")], "surrogate_id int, ano int, v string"
    )
    upsert_parquet(spark, df2, target, partition_by=["ano"])
    rows = {
        (r.surrogate_id, r.change_type)
        for r in snapshot_changes(spark, target).collect()
    }
    assert rows == {(3, "changed"), (4, "inserted")}

    compact_partitions(spark, target, partition_by=["ano"])
    assert snapshot_changes(spark, target).count() == 0


def test_snapshot_changes_ignores_stray_snapshot(spark, tmp_path):
    """Code-review r5: a hard-killed merge can leave a half-written
    snapshot dir (its rmtree-on-exception never ran) NEWER than the
    real predecessor. The CDC diff must follow the pointer's recorded
    lineage, not directory mtime — diffing against the stray would
    fabricate rows in exactly the post-mortem this tool exists for."""
    import os

    from gov_ec_pipeline_etl_spark.sinks.upsert import (
        snapshot_changes,
        upsert_parquet,
    )

    target = str(tmp_path / "tbl")
    df1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "surrogate_id int, v string"
    )
    upsert_parquet(spark, df1, target)
    df2 = spark.createDataFrame([(2, "B")], "surrogate_id int, v string")
    upsert_parquet(spark, df2, target)

    # a stray, newest-mtime, half-written snapshot from a killed merge
    stray = os.path.join(target, "snapshot_deadbeefdead")
    os.makedirs(stray)
    spark.createDataFrame(
        [(999, "junk")], "surrogate_id int, v string"
    ).write.mode("overwrite").parquet(stray)

    rows = {
        (r.surrogate_id, r.change_type)
        for r in snapshot_changes(spark, target).collect()
    }
    assert rows == {(2, "changed")}  # lineage diff; stray invisible


def test_delete_keys_unpartitioned_and_cdc(spark, tmp_path):
    """Keyed DELETE completes the MERGE surface: idempotent, CAS-
    published, and visible as 'deleted' in the CDC diff. Deleting the
    last row leaves a READABLE empty table (the zero-part-file pitfall
    the empty-batch upsert guard documents)."""
    from gov_ec_pipeline_etl_spark.sinks.upsert import (
        delete_keys,
        read_table,
        snapshot_changes,
        upsert_parquet,
    )

    target = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "surrogate_id int, v string"
    )
    upsert_parquet(spark, df, target)
    keys = spark.createDataFrame([(2,), (99,)], "surrogate_id int")
    m = delete_keys(spark, keys, target)
    assert m == {"rows_deleted": 1, "partitions_rewritten": 0}
    assert sorted(r.v for r in read_table(spark, target).collect()) == ["a", "c"]
    # CDC sees the delete
    ch = {
        (r.surrogate_id, r.change_type)
        for r in snapshot_changes(spark, target).collect()
    }
    assert ch == {(2, "deleted")}
    # replay converges (idempotent no-op)
    assert delete_keys(spark, keys, target)["rows_deleted"] == 0
    # deleting everything leaves a readable empty table
    rest = spark.createDataFrame([(1,), (3,)], "surrogate_id int")
    assert delete_keys(spark, rest, target)["rows_deleted"] == 2
    out = read_table(spark, target)
    assert out.count() == 0 and set(out.columns) == {"surrogate_id", "v"}


def test_delete_keys_partition_scoped_empties_partition(spark, tmp_path):
    """Partition-scoped delete rewrites ONLY touched partitions and
    handles the partition-emptying case (dynamic overwrite would have
    silently kept an emptied partition's old rows — this path removes
    the touched dirs from the hard-linked copy and appends survivors)."""
    from gov_ec_pipeline_etl_spark.sinks.upsert import (
        delete_keys,
        read_table,
        upsert_parquet,
    )

    target = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, 2023, "a"), (2, 2023, "b"), (3, 2024, "c"), (4, 2025, "d")],
        "surrogate_id int, ano int, v string",
    )
    upsert_parquet(spark, df, target, partition_by=["ano"])
    # delete BOTH 2023 rows (empties the partition) and one 2024 row
    keys = spark.createDataFrame([(1,), (2,), (3,)], "surrogate_id int")
    m = delete_keys(spark, keys, target, partition_by=["ano"])
    assert m == {"rows_deleted": 3, "partitions_rewritten": 2}
    rows = {(r.surrogate_id, r.ano, r.v) for r in read_table(spark, target).collect()}
    assert rows == {(4, 2025, "d")}


def test_delete_keys_cli(spark, tmp_path, capsys):
    from gov_ec_pipeline_etl_spark.cli import main
    from gov_ec_pipeline_etl_spark.sinks.upsert import read_table, upsert_parquet

    target = str(tmp_path / "tbl")
    upsert_parquet(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "surrogate_id int, v string"),
        target,
    )
    kp = str(tmp_path / "keys")
    spark.createDataFrame([(1,)], "surrogate_id int").write.parquet(kp)
    import json as _json

    assert main(["table", "delete", target, "--keys", kp]) == 0
    assert _json.loads(capsys.readouterr().out.strip())["rows_deleted"] == 1
    assert [r.v for r in read_table(spark, target).collect()] == ["b"]


def test_drop_partitions_retention(spark, tmp_path):
    """Retention as metadata: partitions failing the keep predicate
    vanish without any data rewrite (surviving files are hard-linked,
    byte-identical inodes); drops surface as 'deleted' in the CDC
    diff; replay is a no-op."""
    import os

    import pyspark.sql.functions as F

    from gov_ec_pipeline_etl_spark.sinks.upsert import (
        _current_snapshot,
        drop_partitions,
        read_table,
        snapshot_changes,
        upsert_parquet,
    )

    target = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, 2019, "old"), (2, 2023, "b"), (3, 2024, "c")],
        "surrogate_id int, ano int, v string",
    )
    upsert_parquet(spark, df, target, partition_by=["ano"])
    snap_before = _current_snapshot(target)
    kept_file_inodes = {
        os.stat(os.path.join(r, f)).st_ino
        for r, _, fs in os.walk(os.path.join(snap_before, "ano=2023"))
        for f in fs
    }

    m = drop_partitions(spark, target, ["ano"], F.col("ano") >= 2020)
    assert m == {"partitions_dropped": 1, "partitions_kept": 2}
    rows = {(r.surrogate_id, r.ano) for r in read_table(spark, target).collect()}
    assert rows == {(2, 2023), (3, 2024)}
    # surviving partition files are the SAME inodes (no rewrite)
    snap_after = _current_snapshot(target)
    after_inodes = {
        os.stat(os.path.join(r, f)).st_ino
        for r, _, fs in os.walk(os.path.join(snap_after, "ano=2023"))
        for f in fs
    }
    assert kept_file_inodes & after_inodes
    # CDC sees the retention drop
    ch = {
        (r.surrogate_id, r.change_type)
        for r in snapshot_changes(spark, target).collect()
    }
    assert ch == {(1, "deleted")}
    # idempotent replay
    assert drop_partitions(spark, target, ["ano"], F.col("ano") >= 2020) == {
        "partitions_dropped": 0,
        "partitions_kept": 2,
    }


def test_retain_cli(spark, tmp_path, capsys):
    import json as _json

    from gov_ec_pipeline_etl_spark.cli import main
    from gov_ec_pipeline_etl_spark.sinks.upsert import read_table, upsert_parquet

    target = str(tmp_path / "tbl")
    upsert_parquet(
        spark,
        spark.createDataFrame(
            [(1, 2019, "old"), (2, 2024, "new")],
            "surrogate_id int, ano int, v string",
        ),
        target,
        partition_by=["ano"],
    )
    assert main(
        ["table", "retain", target, "--partition-by", "ano", "--keep", "ano >= 2020"]
    ) == 0
    assert _json.loads(capsys.readouterr().out.strip())["partitions_dropped"] == 1
    assert [r.v for r in read_table(spark, target).collect()] == ["new"]


def test_partition_dir_surgery_rejects_escaped_values(spark, tmp_path):
    """Spark URL-escapes special chars in partition directory names;
    the scoped delete/retention paths do directory surgery with plain
    names, so values needing escaping must be rejected loudly (silent
    miss = undeleted rows), with the unpartitioned path as the remedy."""
    import pyspark.sql.functions as F

    from gov_ec_pipeline_etl_spark.sinks.upsert import (
        delete_keys,
        upsert_parquet,
    )

    target = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "a b", "x")], "surrogate_id int, prov string, v string"
    )
    upsert_parquet(spark, df, target, partition_by=["prov"])
    keys = spark.createDataFrame([(1,)], "surrogate_id int")
    with pytest.raises(ValueError, match="needs filesystem escaping"):
        delete_keys(spark, keys, target, partition_by=["prov"])
    # the unpartitioned remedy works
    assert delete_keys(spark, keys, target)["rows_deleted"] == 1

def test_delete_keys_null_and_boolean_partitions(spark, tmp_path):
    """Null and boolean partition values must delete correctly: Spark
    writes them as __HIVE_DEFAULT_PARTITION__ / 'true', so a str(None)
    / str(True) dirname would silently miss the directory while
    reporting rows_deleted (ADVICE r5, high). The predicate must also
    be null-safe or the emptied partition's survivors vanish."""
    from gov_ec_pipeline_etl_spark.sinks.upsert import (
        delete_keys,
        read_table,
        upsert_parquet,
    )

    target = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, None, "a"), (2, None, "b"), (3, "EC", "c")],
        "surrogate_id int, prov string, v string",
    )
    upsert_parquet(spark, df, target, partition_by=["prov"])
    keys = spark.createDataFrame([(1,)], "surrogate_id int")
    m = delete_keys(spark, keys, target, partition_by=["prov"])
    assert m == {"rows_deleted": 1, "partitions_rewritten": 1}
    rows = {(r.surrogate_id, r.prov, r.v) for r in read_table(spark, target).collect()}
    # row 2 (same null partition, not targeted) must SURVIVE
    assert rows == {(2, None, "b"), (3, "EC", "c")}

    # boolean partition: Spark lays out prov_active=true / =false
    target2 = str(tmp_path / "tbl2")
    df2 = spark.createDataFrame(
        [(1, True, "a"), (2, False, "b")],
        "surrogate_id int, active boolean, v string",
    )
    upsert_parquet(spark, df2, target2, partition_by=["active"])
    m2 = delete_keys(
        spark,
        spark.createDataFrame([(1,)], "surrogate_id int"),
        target2,
        partition_by=["active"],
    )
    assert m2["rows_deleted"] == 1
    assert [r.v for r in read_table(spark, target2).collect()] == ["b"]


def test_delete_keys_empties_whole_partitioned_table(spark, tmp_path):
    """Emptying EVERY partition must still publish a readable snapshot
    (the append writes zero part files — ADVICE r5, medium), and a
    later partitioned upsert onto the empty table must work (the
    fallback snapshot is physically unpartitioned; the scoped merge
    must not hard-link its root file next to new partition dirs)."""
    from gov_ec_pipeline_etl_spark.sinks.upsert import (
        delete_keys,
        read_table,
        upsert_parquet,
    )

    target = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, 2023, "a"), (2, 2024, "b")], "surrogate_id int, ano int, v string"
    )
    upsert_parquet(spark, df, target, partition_by=["ano"])
    keys = spark.createDataFrame([(1,), (2,)], "surrogate_id int")
    m = delete_keys(spark, keys, target, partition_by=["ano"])
    assert m["rows_deleted"] == 2
    out = read_table(spark, target)
    assert out.count() == 0
    assert set(out.columns) == {"surrogate_id", "ano", "v"}
    # the table comes back to life partitioned
    upsert_parquet(
        spark,
        spark.createDataFrame([(9, 2025, "z")], "surrogate_id int, ano int, v string"),
        target,
        partition_by=["ano"],
    )
    rows = {(r.surrogate_id, r.ano, r.v) for r in read_table(spark, target).collect()}
    assert rows == {(9, 2025, "z")}
    # and partition surgery works again on the reborn table
    assert delete_keys(
        spark,
        spark.createDataFrame([(9,)], "surrogate_id int"),
        target,
        partition_by=["ano"],
    )["rows_deleted"] == 1
    assert read_table(spark, target).count() == 0


def test_drop_partitions_null_verdict_and_total_drop(spark, tmp_path):
    """A retention predicate that returns NULL for a partition (e.g.
    ano >= 2020 on a null ano) must error, not silently drop; and
    dropping every partition must leave a readable empty table."""
    import pyspark.sql.functions as F

    from gov_ec_pipeline_etl_spark.sinks.upsert import (
        drop_partitions,
        read_table,
        upsert_parquet,
    )

    target = str(tmp_path / "tbl")
    upsert_parquet(
        spark,
        spark.createDataFrame(
            [(1, None, "a"), (2, 2024, "b")], "surrogate_id int, ano int, v string"
        ),
        target,
        partition_by=["ano"],
    )
    with pytest.raises(ValueError, match="returned NULL"):
        drop_partitions(spark, target, ["ano"], F.col("ano") >= 2020)
    # table untouched by the failed retention
    assert read_table(spark, target).count() == 2
    # explicit-null policy works and can empty the table
    m = drop_partitions(
        spark, target, ["ano"], F.coalesce(F.col("ano") >= 3000, F.lit(False))
    )
    assert m == {"partitions_dropped": 2, "partitions_kept": 0}
    out = read_table(spark, target)
    assert out.count() == 0
    assert set(out.columns) == {"surrogate_id", "ano", "v"}


def test_compact_on_emptied_table_is_noop(spark, tmp_path):
    """A maintenance compaction scheduled after a delete-all must not
    publish a zero-file snapshot (rewriting 0 rows schedules no write
    tasks): it no-ops and the table stays readable, then revives."""
    from gov_ec_pipeline_etl_spark.sinks.upsert import (
        compact_partitions,
        delete_keys,
        read_table,
        upsert_parquet,
    )

    for part in (None, ["ano"]):
        target = str(tmp_path / f"tbl_{bool(part)}")
        df = spark.createDataFrame(
            [(1, 2023, "a"), (2, 2024, "b")],
            "surrogate_id int, ano int, v string",
        )
        upsert_parquet(spark, df, target, partition_by=part)
        keys = spark.createDataFrame([(1,), (2,)], "surrogate_id int")
        assert delete_keys(spark, keys, target, partition_by=part)[
            "rows_deleted"
        ] == 2
        m = compact_partitions(spark, target, partition_by=part)
        assert m["files_before"] == m["files_after"]
        out = read_table(spark, target)
        assert out.count() == 0
        assert set(out.columns) == {"surrogate_id", "ano", "v"}
        upsert_parquet(
            spark,
            spark.createDataFrame(
                [(9, 2025, "z")], "surrogate_id int, ano int, v string"
            ),
            target,
            partition_by=part,
        )
        assert read_table(spark, target).count() == 1


def test_partition_dir_mismatch_fails_loudly(spark, tmp_path, monkeypatch):
    """If a rendered partition dirname ever diverges from the on-disk
    layout again (the ADVICE r5 null/boolean class), the surgery must
    raise — not silently retain rows it reports deleted — and the
    failed attempt must leave the table untouched."""
    import gov_ec_pipeline_etl_spark.sinks.upsert as up

    target = str(tmp_path / "tbl")
    up.upsert_parquet(
        spark,
        spark.createDataFrame(
            [(1, 2023, "a"), (2, 2024, "b")],
            "surrogate_id int, ano int, v string",
        ),
        target,
        partition_by=["ano"],
    )
    monkeypatch.setattr(
        up, "_partition_dirname", lambda c, v: f"{c}={v}__WRONG"
    )
    keys = spark.createDataFrame([(1,)], "surrogate_id int")
    with pytest.raises(RuntimeError, match="rendering mismatch"):
        up.delete_keys(spark, keys, target, partition_by=["ano"])
    with pytest.raises(RuntimeError, match="rendering mismatch"):
        import pyspark.sql.functions as F

        up.drop_partitions(spark, target, ["ano"], F.col("ano") >= 2024)
    assert up.read_table(spark, target).count() == 2
