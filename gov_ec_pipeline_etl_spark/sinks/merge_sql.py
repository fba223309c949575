"""Database-target keyed upsert: set-based MERGE executed BY the target.

Reference parity: etl/load.py:387-441 pushed row batches at a REST API
with shrinking-batch retry. Against a real database the engine-native
shape is: stage rows executor-side, have the DATABASE run the merge —
``INSERT … ON CONFLICT (key) DO UPDATE`` (SQLite/Postgres) or ANSI
``MERGE INTO`` — so the merge is set-based and transactional regardless
of which executor delivered which partition.

Two layers:

- ``merge_upsert_sql`` — the statement generator (dialect-aware).
- ``upsert_dbapi`` — the distributed executor: ``df.foreachPartition``
  opens one DB-API connection per partition and streams batched
  ``executemany`` calls with the reference's shrinking-batch retry
  semantics (halve the batch on failure, retry with backoff — a poison
  row is isolated down to batch size 1 and reported precisely).

With a JDBC driver jar on the classpath the same plan shape is
``df.write.jdbc`` into a staging table + a single target-side MERGE;
``upsert_dbapi`` is the driverless equivalent, gated end-to-end against
SQLite (file DB, real concurrency) in tests/test_merge_sink.py.
"""

from __future__ import annotations

import functools
import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame

_DIALECTS = ("sqlite", "postgres", "ansi")

# Placeholder token is a DRIVER (DB-API paramstyle) property, not a SQL
# dialect property: psycopg2 uses format (%s), sqlite3/duckdb use qmark
# (?). Kept orthogonal so e.g. the postgres ON CONFLICT statement can be
# executed through a qmark driver (how tests/test_merge_sink.py gates
# the postgres dialect end-to-end against DuckDB's pg-derived parser).
_PARAMSTYLES = {"qmark": "?", "format": "%s"}


def _sqlite_connect(path: str, timeout_s: float):
    import sqlite3

    con = sqlite3.connect(path, timeout=timeout_s)
    con.execute(f"PRAGMA busy_timeout={int(timeout_s * 1000)}")
    return con


def sqlite_connect_factory(
    path: str, timeout_s: float = 30.0
) -> Callable[[], object]:
    """Executor-safe connect factory for a SQLite target. Defined here
    (not in caller code) so the pickle resolves by module reference on
    executors; the busy timeout absorbs concurrent partition writers."""
    return functools.partial(_sqlite_connect, path, timeout_s)


def _duckdb_connect(path: str):
    import duckdb

    return duckdb.connect(path)


def duckdb_connect_factory(path: str) -> Callable[[], object]:
    """Executor-safe connect factory for a DuckDB target (pg-derived SQL
    parser; qmark paramstyle). DuckDB is single-writer ACROSS PROCESSES,
    so callers must serialize partitions (``df.coalesce(1)``) — unlike
    SQLite there is no busy-timeout handshake between writer processes;
    used to gate the postgres dialect end-to-end without a server."""
    return functools.partial(_duckdb_connect, path)


def merge_upsert_sql(
    table: str,
    columns: list[str],
    key: str,
    dialect: str = "sqlite",
    paramstyle: str | None = None,
) -> str:
    """Parameterized upsert statement for one row (placeholders in
    ``columns`` order). ``key`` must be a unique/primary-key column on
    the target table — ON CONFLICT resolution requires it.
    ``paramstyle`` defaults to the dialect's usual driver (postgres →
    format, else qmark) but is overridable for drivers that differ."""
    if dialect not in _DIALECTS:
        raise ValueError(f"unknown dialect {dialect!r}; one of {_DIALECTS}")
    if key not in columns:
        raise ValueError(f"key {key!r} not in columns {columns}")
    if paramstyle is None:
        paramstyle = "format" if dialect == "postgres" else "qmark"
    if paramstyle not in _PARAMSTYLES:
        raise ValueError(
            f"unknown paramstyle {paramstyle!r}; one of {tuple(_PARAMSTYLES)}"
        )
    ph = _PARAMSTYLES[paramstyle]
    collist = ", ".join(columns)
    placeholders = ", ".join(ph for _ in columns)
    non_key = [c for c in columns if c != key]
    if dialect in ("sqlite", "postgres"):
        sets = ", ".join(f"{c} = excluded.{c}" for c in non_key)
        action = f"DO UPDATE SET {sets}" if non_key else "DO NOTHING"
        return (
            f"INSERT INTO {table} ({collist}) VALUES ({placeholders}) "
            f"ON CONFLICT ({key}) {action}"
        )
    # ANSI MERGE (one-row USING clause) for engines without ON CONFLICT
    src_cols = ", ".join(f"{ph} AS {c}" for c in columns)
    sets = ", ".join(f"t.{c} = s.{c}" for c in non_key)
    ins_vals = ", ".join(f"s.{c}" for c in columns)
    upd = f"WHEN MATCHED THEN UPDATE SET {sets} " if non_key else ""
    return (
        f"MERGE INTO {table} t USING (SELECT {src_cols}) s "
        f"ON t.{key} = s.{key} "
        f"{upd}"
        f"WHEN NOT MATCHED THEN INSERT ({collist}) VALUES ({ins_vals})"
    )


def write_batches(
    cursor,
    sql: str,
    rows: list[tuple],
    batch_size: int = 500,
    max_retries: int = 4,
    backoff_s: float = 0.2,
    sleep: Callable[[float], None] = time.sleep,
) -> int:
    """Shrinking-batch executemany (reference load.py:387-441 semantics):
    a failing batch is retried with backoff, then HALVED and each half
    retried independently, isolating a poison row down to batch size 1
    (which, still failing, raises with that row attached). Returns the
    number of rows written."""
    written = 0
    stack: list[list[tuple]] = [
        rows[i : i + batch_size] for i in range(0, len(rows), batch_size)
    ]
    stack.reverse()  # preserve row order (stack pops from the end)
    while stack:
        batch = stack.pop()
        err = None
        for attempt in range(max_retries):
            try:
                cursor.executemany(sql, batch)
                written += len(batch)
                err = None
                break
            except Exception as e:  # noqa: BLE001 — DB-API errors are dialect-specific
                err = e
                sleep(backoff_s * (2**attempt))
        if err is not None:
            if len(batch) == 1:
                raise RuntimeError(
                    f"row rejected by target after {max_retries} tries: "
                    f"{batch[0]!r}"
                ) from err
            mid = len(batch) // 2
            stack.append(batch[mid:])
            stack.append(batch[:mid])
    return written


def upsert_dbapi(
    df: DataFrame,
    connect_factory: Callable[[], object],
    table: str,
    key: str,
    dialect: str = "sqlite",
    batch_size: int = 500,
    max_retries: int = 4,
    backoff_s: float = 0.2,
    paramstyle: str | None = None,
) -> None:
    """Distributed keyed upsert into a DB-API target.

    ``connect_factory`` must be picklable (module-level function or
    ``functools.partial``) and is invoked ON THE EXECUTOR, once per
    partition — connections never cross the serialization boundary.
    The target database serializes concurrent partition writers
    (Postgres: row-level; SQLite: database lock + busy timeout), which
    the retry/backoff loop absorbs.
    """
    columns = list(df.columns)
    sql = merge_upsert_sql(table, columns, key, dialect, paramstyle)

    def run_partition(rows: Iterator) -> None:
        batch = [tuple(r[c] for c in columns) for r in rows]
        if not batch:
            return
        con = connect_factory()
        try:
            cur = con.cursor()
            write_batches(
                cur,
                sql,
                batch,
                batch_size=batch_size,
                max_retries=max_retries,
                backoff_s=backoff_s,
            )
            con.commit()
        finally:
            con.close()

    df.foreachPartition(run_partition)
