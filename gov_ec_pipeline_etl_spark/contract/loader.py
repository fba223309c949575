"""Config loading: YAML or JSON by extension sniffing, top-level mapping
required (reference O4 semantics — etl/yaml_config_loader.py:36-98)."""

from __future__ import annotations

import json
import os
from typing import Any

import yaml


class ConfigError(ValueError):
    pass


def load_config(path: str) -> dict[str, Any]:
    if not os.path.exists(path):
        raise ConfigError(f"config not found: {path}")
    ext = os.path.splitext(path)[1].lower()
    with open(path, encoding="utf-8") as f:
        if ext in (".yaml", ".yml"):
            data = yaml.safe_load(f)
        elif ext == ".json":
            data = json.load(f)
        else:
            # sniff: try YAML (superset of JSON)
            data = yaml.safe_load(f)
    if not isinstance(data, dict):
        raise ConfigError(
            f"config root must be a mapping, got {type(data).__name__}: {path}"
        )
    return data
