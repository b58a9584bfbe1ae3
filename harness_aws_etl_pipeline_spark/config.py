"""Engine configuration: YAML document + environment overrides.

Reproduces the reference's config semantics (reference:
etl/src/utils/config.py:64-100 — YAML file with dot-path lookup and
environment-variable overrides; config/config.yaml holds the defaults)
without any of its AWS-specific keys being required.

Lookup: ``cfg.get("etl.transform.null_handling", "drop")`` walks the
nested dict by dot path. Environment override: a variable named
``ETL_TRANSFORM_NULL_HANDLING`` (dot path upper-cased, dots → ``_``)
wins over the file value; booleans/ints/floats are parsed from the
string (reference: etl/src/utils/config.py:104-108 parses env booleans).
"""

from __future__ import annotations

import os
from typing import Any

try:
    import yaml  # type: ignore

    _HAVE_YAML = True
except Exception:  # pragma: no cover - container may lack pyyaml
    _HAVE_YAML = False

DEFAULTS: dict[str, Any] = {
    "etl": {
        "extract": {
            # Kept as an *optional* guardrail; the reference needed it
            # because of the 256 MB Lambda (config.yaml:79). 0 = off.
            "max_file_size_mb": 0,
            "supported_formats": ["csv", "json", "jsonl", "parquet"],
            "infer_schema": True,
            "per_file_error_isolation": True,
        },
        "transform": {
            # drop | fill | flag (reference: config.yaml:83,
            # transformer.py:127-141)
            "null_handling": "drop",
            "deduplicate": True,
            "infer_dates": True,
            "infer_numeric": True,
            "numeric_parse_threshold": 0.8,
            "add_processing_metadata": True,
        },
        "load": {
            "format": "parquet",
            "compression": "snappy",
            "partition_by": ["_year", "_month", "_day"],
            "mode": "append",
        },
    },
    "storage": {
        # Age-based retention per storage tier, in days (reference:
        # config/config.yaml:35-37 raw/processed/archive retention,
        # enforced there by S3 lifecycle rules, terraform
        # main.tf:101-141). The engine enforces them with
        # sinks/retention.sweep_expired; on a real object store,
        # declare bucket lifecycle rules too and keep these as the
        # engine-side mirror.
        "retention": {
            "raw_days": 30,
            "processed_days": 90,
            "archive_days": 365,
        },
    },
    "monitoring": {
        "alerts": {"error_threshold": 3, "latency_threshold_ms": 30000},
    },
}


def _deep_merge(base: dict, other: dict) -> dict:
    out = dict(base)
    for k, v in other.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _parse_env_value(raw: str) -> Any:
    low = raw.strip().lower()
    if low in ("true", "yes", "1", "on"):
        return True
    if low in ("false", "no", "0", "off"):
        return False
    for caster in (int, float):
        try:
            return caster(raw)
        except ValueError:
            pass
    return raw


class EngineConfig:
    """Nested-dict config with dot-path access and env overrides."""

    def __init__(self, data: dict[str, Any] | None = None, env_prefix: str = ""):
        self._data = _deep_merge(DEFAULTS, data or {})
        self._env_prefix = env_prefix

    @classmethod
    def from_yaml(cls, path: str, env_prefix: str = "") -> "EngineConfig":
        if not _HAVE_YAML:
            raise RuntimeError("pyyaml not available; construct EngineConfig from a dict")
        with open(path) as fh:
            return cls(yaml.safe_load(fh) or {}, env_prefix=env_prefix)

    def get(self, dot_path: str, default: Any = None) -> Any:
        env_key = self._env_prefix + dot_path.upper().replace(".", "_")
        if env_key in os.environ:
            return _parse_env_value(os.environ[env_key])
        node: Any = self._data
        for part in dot_path.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def as_dict(self) -> dict[str, Any]:
        return self._data
