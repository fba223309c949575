from __future__ import annotations

import pytest

from gov_ec_pipeline_etl_spark.config import SettingsError, load_settings


def test_defaults(monkeypatch):
    for var in [
        "SPARK_GRAFT_CPUS",
        "SPARK_GRAFT_ARTIFACTS_MAX_MB",
        "SPARK_GRAFT_ARTIFACTS_MODE",
    ]:
        monkeypatch.delenv(var, raising=False)
    s = load_settings()
    assert s.artifacts_max_mb == 50.0
    assert s.artifacts_mode == "manifest"
    assert s.sheet_blacklist == ("contenido",)
    assert hash(s)  # frozen


def test_fail_fast_naming_the_variable(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS_MAX_MB", "not-a-number")
    with pytest.raises(SettingsError, match="SPARK_GRAFT_ARTIFACTS_MAX_MB"):
        load_settings()
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS_MAX_MB", "-3")
    with pytest.raises(SettingsError, match="positive"):
        load_settings()
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS_MAX_MB", "50")
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS_MODE", "yolo")
    with pytest.raises(SettingsError, match="ARTIFACTS_MODE"):
        load_settings()


def test_blacklist_csv(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SHEET_BLACKLIST", "Contenido, Notas ,")
    assert load_settings().sheet_blacklist == ("contenido", "notas")


def test_driver_memory_env_override(monkeypatch):
    from gov_ec_pipeline_etl_spark.session import _default_driver_memory

    monkeypatch.setenv("SPARK_GRAFT_DRIVER_MEM", "6g")
    assert _default_driver_memory() == "6g"
    monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM", raising=False)
    derived = _default_driver_memory()
    # RAM-derived: between the 2g floor and the 32g cap, never above
    # ~1/4 of physical memory
    gb = int(derived.rstrip("g"))
    assert 2 <= gb <= 32
