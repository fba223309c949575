"""Per-process staging root for streaming replay/checkpoint directories.

Every ``run_*`` streaming harness stages its file-source replay (and any
checkpoint/output dirs) under one per-process root that is removed at
interpreter exit. Before this, each invocation dropped orphaned parquet
dirs straight into ``tempfile.gettempdir()`` — a long gate/test session
accumulated hundreds of them with no owner (ADVICE round 6). Staging
dirs are only ever consumed within the process that created them (fresh
``uuid`` per call, memory-sink results are driver-resident after
``awaitTermination``), so exit-time cleanup cannot race a reader; a
SIGKILLed run leaks one root, reclaimed by the OS tempdir policy.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

_ROOT: str | None = None


def session_staging_dir(prefix: str) -> str:
    """Return a fresh unique path (not yet created) under the
    per-process staging root; the root is rmtree'd at exit."""
    global _ROOT
    if _ROOT is None:
        _ROOT = os.path.join(
            tempfile.gettempdir(),
            f"spark_graft_staging_{os.getpid()}_{uuid.uuid4().hex[:6]}",
        )
        os.makedirs(_ROOT, exist_ok=True)
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return os.path.join(_ROOT, f"{prefix}_{uuid.uuid4().hex[:8]}")


import contextlib  # noqa: E402


@contextlib.contextmanager
def state_partitions_for(spark, n_rows: int, rows_per_store: int = 50_000):
    """Scope ``spark.sql.shuffle.partitions`` to a stateful stream's
    replay so the state-store instance count tracks the replayed INPUT
    SIZE instead of the session's batch width (guide §2.2: size
    partitions to data).

    Every stateful streaming operator opens/commits/maintains ONE state
    store per shuffle partition per micro-batch — pure fixed machinery
    when the keyed state is small (measured r11 at sf0.01: st04 7.4 ->
    3.4 s, v06 7.9 -> 3.0 s going 64 -> 8 stores). The width is derived
    from the staged row count (parquet-footer read, no job), floored at
    8 and NEVER RAISED above the session default, so a real cluster's
    explicitly-sized session conf always wins — this only trims the
    small-replay case, it is not a local-core tuning. Structured
    Streaming pins the width into the checkpoint on first batch, which
    is exactly why it must be right at stream start.
    """
    sess = int(spark.conf.get("spark.sql.shuffle.partitions"))
    scoped = max(8, min(sess, -(-int(n_rows) // rows_per_store)))
    spark.conf.set("spark.sql.shuffle.partitions", str(scoped))
    try:
        yield scoped
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(sess))
