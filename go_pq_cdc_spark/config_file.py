"""O34 — configuration file loading (reference `config/read.go:11-41`:
reads YAML or JSON into the Config struct, then validates).

YAML is optional (import-gated): JSON always works; a `.yaml`/`.yml` path
needs PyYAML on the driver. Unknown keys are rejected loudly — silent
typo-swallowing in capture configs is how tables go un-replicated."""

from __future__ import annotations

import json
from dataclasses import fields

from .config import ConfigError, EngineConfig, TableConfig

_ENGINE_KEYS = {f.name for f in fields(EngineConfig)}
_TABLE_KEYS = {f.name for f in fields(TableConfig)}


def _parse(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    if path.endswith((".yaml", ".yml")):
        try:
            import yaml
        except ImportError as exc:  # pragma: no cover - container has yaml
            raise ConfigError(
                f"{path}: YAML config requires PyYAML; use JSON instead"
            ) from exc
        data = yaml.safe_load(text)
    else:
        data = json.loads(text)
    if not isinstance(data, dict):
        raise ConfigError(f"{path}: top-level config must be a mapping")
    return data


def config_from_dict(data: dict) -> EngineConfig:
    data = dict(data)
    raw_tables = data.pop("tables", [])
    unknown = set(data) - _ENGINE_KEYS
    if unknown:
        raise ConfigError(f"unknown config keys: {sorted(unknown)}")
    tables = []
    for i, t in enumerate(raw_tables):
        if not isinstance(t, dict):
            raise ConfigError(f"tables[{i}] must be a mapping")
        bad = set(t) - _TABLE_KEYS
        if bad:
            raise ConfigError(f"tables[{i}]: unknown keys {sorted(bad)}")
        tables.append(TableConfig(**t))
    if "publish_ops" in data and isinstance(data["publish_ops"], list):
        data["publish_ops"] = tuple(data["publish_ops"])
    cfg = EngineConfig(tables=tables, **data)
    cfg.validate()
    return cfg


def load_config(path: str) -> EngineConfig:
    """Read + validate an engine config from a YAML/JSON file."""
    return config_from_dict(_parse(path))
