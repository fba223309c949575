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
