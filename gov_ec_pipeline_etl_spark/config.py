"""Env-driven engine settings (reference O2/O3 semantics —
etl/config.py:148-221: frozen dataclasses, required-var fail-fast,
defensive coercion with explicit errors).

All variables use the ``SPARK_GRAFT_`` prefix. Nothing here touches
Spark conf directly — ``session.get_spark`` consumes the result.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


class SettingsError(ValueError):
    pass


_ARTIFACT_MODES = ("manifest", "skip", "strict")


def _get(name: str, default: str | None = None, required: bool = False) -> str | None:
    val = os.environ.get(name, default)
    if required and (val is None or str(val).strip() == ""):
        raise SettingsError(f"required environment variable missing: {name}")
    return val


def _coerce_float_pos(name: str, raw: str) -> float:
    try:
        v = float(raw)
    except ValueError as e:
        raise SettingsError(f"{name} must be a number, got {raw!r}") from e
    if v <= 0:
        raise SettingsError(f"{name} must be positive, got {v}")
    return v


def _coerce_int_pos(name: str, raw: str) -> int:
    try:
        v = int(raw)
    except ValueError as e:
        raise SettingsError(f"{name} must be an integer, got {raw!r}") from e
    if v <= 0:
        raise SettingsError(f"{name} must be positive, got {v}")
    return v


def _coerce_mode(name: str, raw: str) -> str:
    v = raw.strip().lower()
    if v not in _ARTIFACT_MODES:
        raise SettingsError(
            f"{name} must be one of {_ARTIFACT_MODES}, got {raw!r}"
        )
    return v


@dataclass(frozen=True)
class Settings:
    work_dir: str
    sf_dir: str
    cpus: int
    artifacts_max_mb: float
    artifacts_mode: str
    sheet_blacklist: tuple[str, ...]
    shuffle_partitions: int


def load_settings() -> Settings:
    """Fail-fast: every malformed value raises SettingsError naming the
    variable; defaults suit the local harness."""
    return Settings(
        work_dir=_get("SPARK_GRAFT_WORK_DIR", "./work"),
        sf_dir=_get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        cpus=_coerce_int_pos("SPARK_GRAFT_CPUS", _get("SPARK_GRAFT_CPUS", "32")),
        artifacts_max_mb=_coerce_float_pos(
            "SPARK_GRAFT_ARTIFACTS_MAX_MB",
            _get("SPARK_GRAFT_ARTIFACTS_MAX_MB", "50"),
        ),
        artifacts_mode=_coerce_mode(
            "SPARK_GRAFT_ARTIFACTS_MODE",
            _get("SPARK_GRAFT_ARTIFACTS_MODE", "manifest"),
        ),
        sheet_blacklist=tuple(
            s.strip().lower()
            for s in _get("SPARK_GRAFT_SHEET_BLACKLIST", "contenido").split(",")
            if s.strip()
        ),
        shuffle_partitions=_coerce_int_pos(
            "SPARK_GRAFT_SHUFFLE_PARTITIONS",
            _get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64"),
        ),
    )
