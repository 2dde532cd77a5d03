"""Model lifecycle helpers — the functional analogue of the reference's
ModelBase/CNNBase torch base classes (reference: src/models/base.py:9-78,
src/models/cnn/base_cnn.py:15-153: build-from-config, param counting,
freeze/param-group helpers)."""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from .layers import count_params
from .registry import ModelRegistry, cfg_get


def init_model(
    model: Any,
    rng: jax.Array,
    img_size: Optional[int] = None,
    in_channels: Optional[int] = None,
    batch_size: int = 1,
    train: bool = False,
) -> Any:
    """Initialise variables with a dummy batch sized from the module/config."""
    size = img_size or getattr(model, "img_size", 224)
    ch = in_channels or getattr(model, "in_channels", 1)
    dummy = jnp.zeros((batch_size, size, size, ch), dtype=jnp.float32)
    rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
    return model.init(rngs, dummy, train=train)


def create_and_init(
    config: Any, rng: jax.Array, train: bool = False
) -> Tuple[Any, Any]:
    """Registry create + init → (module, variables). Honors
    `pretrained` / `pretrained_path` from the config by warm-starting from a
    local torch checkpoint (reference: model YAMLs' pretrained flag;
    all_models_full_kfold_experiment.py:100-131 forces it)."""
    model = ModelRegistry.create_model(config)
    img_size = cfg_get(config, "img_size", None)
    in_channels = cfg_get(config, "in_channels", 1)
    variables = init_model(model, rng, img_size=img_size,
                           in_channels=in_channels, train=train)
    if cfg_get(config, "pretrained", False) or cfg_get(config, "pretrained_path", None):
        from .import_torch import maybe_load_pretrained

        variables = maybe_load_pretrained(config, variables)
    return model, variables


def num_parameters(variables: Any) -> int:
    params = variables.get("params", variables) if hasattr(variables, "get") else variables
    return count_params(params)


def forward(model: Any, variables: Any, x: jnp.ndarray, *,
            train: bool = False, rng: Optional[jax.Array] = None,
            capture: bool = False):
    """Uniform apply wrapper: handles dropout rngs, mutable batch_stats, and
    intermediate capture. Returns (outputs, new_model_state, intermediates)."""
    rngs = {"dropout": rng} if rng is not None else None
    mutable = []
    if train:
        mutable.append("batch_stats")
    if capture:
        mutable.append("intermediates")
    kwargs = {"capture": True} if capture else {}
    if mutable:
        out, updated = model.apply(variables, x, train=train, rngs=rngs,
                                   mutable=mutable, **kwargs)
        return out, updated.get("batch_stats"), updated.get("intermediates")
    out = model.apply(variables, x, train=train, rngs=rngs, **kwargs)
    return out, None, None
