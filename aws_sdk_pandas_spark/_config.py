"""Global configuration.

Re-expresses the reference's config system (awswrangler/_config.py:35-81):
a process-global config object whose keys can be set programmatically or
via environment variables (prefix ``WS_`` there, ``ASPS_`` here), applied
to functions through the ``apply_configs`` decorator — a kwarg that the
caller did not pass explicitly is filled from the config.
"""

from __future__ import annotations

import functools
import inspect
import os
from typing import Any, Callable, TypeVar

_F = TypeVar("_F", bound=Callable[..., Any])

# name -> (type, default). Mirrors the spirit of the reference's
# _CONFIG_ARGS table (awswrangler/_config.py:35-81), trimmed to knobs that
# exist in a Spark-native engine.
_CONFIG_KEYS: dict[str, tuple[type, Any]] = {
    "max_cache_seconds": (int, 0),  # SQL result-cache window (athena/_cache.py)
    "max_cache_query_inspections": (int, 50),
    "max_rows_by_file": (int, 0),  # 0 = unlimited (maps to maxRecordsPerFile)
    "dataset_compression": (str, "snappy"),
    "chunksize": (int, 0),
    "sanitize_columns": (bool, False),
}

_ENV_PREFIX = "ASPS_"


class _Config:
    """Process-global config; attribute access per key."""

    def __init__(self) -> None:
        self._values: dict[str, Any] = {}
        self._load_env()

    def _load_env(self) -> None:
        for key, (typ, _default) in _CONFIG_KEYS.items():
            env = os.environ.get(_ENV_PREFIX + key.upper())
            if env is None:
                continue
            if typ is bool:
                self._values[key] = env.strip().lower() in ("1", "true", "yes")
            else:
                self._values[key] = typ(env)

    def __getattr__(self, key: str) -> Any:
        if key.startswith("_"):
            raise AttributeError(key)
        if key not in _CONFIG_KEYS:
            raise AttributeError(f"unknown config key: {key}")
        return self._values.get(key, _CONFIG_KEYS[key][1])

    def __setattr__(self, key: str, value: Any) -> None:
        if key.startswith("_"):
            super().__setattr__(key, value)
            return
        if key not in _CONFIG_KEYS:
            raise AttributeError(f"unknown config key: {key}")
        typ = _CONFIG_KEYS[key][0]
        self._values[key] = typ(value)

    def reset(self, key: str | None = None) -> None:
        if key is None:
            self._values.clear()
            self._load_env()
        else:
            self._values.pop(key, None)

    def to_dict(self) -> dict[str, Any]:
        return {k: getattr(self, k) for k in _CONFIG_KEYS}


config = _Config()


def apply_configs(function: _F) -> _F:
    """Fill not-passed kwargs from the global config (reference:
    ``@apply_configs``, awswrangler/_config.py:734-760)."""

    signature = inspect.signature(function)
    configurable = [name for name in signature.parameters if name in _CONFIG_KEYS]

    @functools.wraps(function)
    def wrapper(*args: Any, **kwargs: Any) -> Any:
        bound = signature.bind_partial(*args, **kwargs)
        for name in configurable:
            if name not in bound.arguments:
                override = getattr(config, name)
                if override != _CONFIG_KEYS[name][1]:
                    kwargs[name] = override
        return function(*args, **kwargs)

    return wrapper  # type: ignore[return-value]
