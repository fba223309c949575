"""Artifact store (SURVEY.md §2.13 W4/W5).

Run artifacts (raw files, reports, config snapshots, logs) are copied
into ``{root}/{env}/{dataset}/runs/{run_id}/...``. Per-file failures are
non-fatal (recorded, not raised). Oversize policy per the reference
(load.py:175-274): files over ``max_mb`` are handled by mode —
``manifest`` writes ``<name>.oversize.json`` with size+sha256,
``skip`` drops them silently, ``strict`` raises.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import Any


def sha256_file(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def upload_file(
    src: str, dest: str, max_mb: float = 50.0, mode: str = "manifest"
) -> dict[str, Any]:
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    size = os.path.getsize(src)
    if size > max_mb * 1024 * 1024:
        if mode == "strict":
            raise ValueError(f"artifact over {max_mb} MB: {src}")
        if mode == "skip":
            return {"file": src, "status": "skipped_oversize", "size": size}
        manifest = {
            "original": os.path.basename(src),
            "size": size,
            "sha256": sha256_file(src),
        }
        with open(dest + ".oversize.json", "w", encoding="utf-8") as f:
            json.dump(manifest, f, sort_keys=True)
        return {"file": src, "status": "manifest", "size": size}
    shutil.copy2(src, dest)
    return {"file": src, "status": "uploaded", "size": size}


def upload_tree(
    src_root: str,
    dest_root: str,
    max_mb: float = 50.0,
    mode: str = "manifest",
) -> list[dict[str, Any]]:
    """Recursive copy; per-file errors are recorded, never raised
    (reference 'degrade, record, continue' ladder)."""
    results: list[dict[str, Any]] = []
    for dirpath, _dirs, files in os.walk(src_root):
        for name in files:
            src = os.path.join(dirpath, name)
            rel = os.path.relpath(src, src_root)
            dest = os.path.join(dest_root, rel)
            try:
                results.append(upload_file(src, dest, max_mb, mode))
            except Exception as e:  # noqa: BLE001 — non-fatal by contract
                if mode == "strict":
                    raise
                results.append(
                    {"file": src, "status": "error", "error": str(e)}
                )
    return results
