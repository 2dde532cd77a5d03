"""Model registry — two-level {type: {name: builder}} map with decorator
registration and config-driven construction.

Reference parity: src/models/registry.py:9-166 (ModelRegistry.register /
create_model / list_models). Differences by design: builders return flax
Modules (stateless); `create_model` accepts either a plain name or a config
mapping and searches every type for the name, passing the full config through
to the builder — same lookup contract as the reference (registry.py:48-98).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, List, Optional

import flax.linen as nn


class ModelRegistry:
    _registry: Dict[str, Dict[str, Callable[..., nn.Module]]] = {}

    @classmethod
    def register(
        cls, names: str | Iterable[str], model_type: str = "cnn"
    ) -> Callable:
        """Decorator: register a builder under one or more names."""
        if isinstance(names, str):
            names = [names]

        def deco(builder: Callable[..., nn.Module]):
            bucket = cls._registry.setdefault(model_type, {})
            for name in names:
                if name in bucket:
                    raise ValueError(f"model '{name}' already registered in '{model_type}'")
                bucket[name] = builder
            return builder

        return deco

    @classmethod
    def create_model(cls, config: Any) -> nn.Module:
        """Build a model from a config mapping (needs `name`; other fields are
        forwarded) or a bare name string."""
        if isinstance(config, str):
            name, cfg = config, {}
        else:
            name = config.get("name") if hasattr(config, "get") else getattr(config, "name")
            cfg = config
        if name is None:
            raise ValueError("model config must carry a 'name'")
        builder = cls.lookup(name)
        if builder is None:
            raise ValueError(
                f"unknown model '{name}'. Registered: {cls.list_models()}"
            )
        return builder(cfg)

    @classmethod
    def lookup(cls, name: str) -> Optional[Callable[..., nn.Module]]:
        for bucket in cls._registry.values():
            if name in bucket:
                return bucket[name]
        return None

    @classmethod
    def model_type(cls, name: str) -> Optional[str]:
        for mtype, bucket in cls._registry.items():
            if name in bucket:
                return mtype
        return None

    @classmethod
    def list_models(cls, model_type: str | None = None) -> List[str] | Dict[str, List[str]]:
        if model_type is not None:
            return sorted(cls._registry.get(model_type, {}))
        return {t: sorted(b) for t, b in cls._registry.items()}

    @classmethod
    def clear(cls) -> None:  # for tests
        cls._registry.clear()


def resolve_dtype(cfg: Any):
    """Map a config 'dtype' field ('bf16'/'f32'/None) to a jnp dtype."""
    import jax.numpy as jnp

    v = cfg_get(cfg, "dtype", None)
    if v in (None, "f32", "float32", "32-true"):
        return jnp.float32
    if v in ("bf16", "bfloat16", "16-mixed"):
        return jnp.bfloat16
    return v


def cfg_get(cfg: Any, key: str, default: Any = None) -> Any:
    """Tolerant config getter: attribute, mapping, or nested `params`."""
    if cfg is None:
        return default
    # mapping lookup first — attribute access on dicts would hit method names
    # like 'values'/'items'/'keys'
    if isinstance(cfg, dict):
        if key in cfg and cfg[key] is not None:
            return cfg[key]
    elif hasattr(cfg, key):
        v = getattr(cfg, key)
        if v is not None:
            return v
    params = None
    if hasattr(cfg, "params"):
        params = getattr(cfg, "params")
    elif isinstance(cfg, dict):
        params = cfg.get("params")
    if params is not None and params is not cfg:
        return cfg_get(params, key, default)
    return default
