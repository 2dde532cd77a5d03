"""DenseNet family (flax, NHWC).

The reference delegates to timm (reference: src/models/cnn/densenet.py:14-54);
here the architecture is implemented from scratch with the standard
121/161/169/201 block plans and native `in_channels`.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..registry import ModelRegistry, cfg_get, resolve_dtype

Dtype = Any


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.Conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.growth_rate, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(y)
        if self.dropout_rate > 0:
            y = nn.Dropout(self.dropout_rate)(y, deterministic=not train)
        return jnp.concatenate([x, y], axis=-1)


class Transition(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNet(nn.Module):
    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    num_init_features: int = 64
    bn_size: int = 4
    dropout_rate: float = 0.0
    num_classes: int = 2
    in_channels: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 capture: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.num_init_features, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False, dtype=self.dtype,
                    name="conv0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="norm0")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        features = self.num_init_features
        for i, n_layers in enumerate(self.block_config):
            for j in range(n_layers):
                x = DenseLayer(self.growth_rate, self.bn_size,
                               self.dropout_rate, dtype=self.dtype,
                               name=f"denseblock{i + 1}_layer{j + 1}")(x, train)
            features += n_layers * self.growth_rate
            if i != len(self.block_config) - 1:
                features = features // 2
                x = Transition(features, dtype=self.dtype,
                               name=f"transition{i + 1}")(x, train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="norm_final")(x)
        x = nn.relu(x)
        if capture:
            self.sow("intermediates", "features", x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="classifier")(x)


DENSENET_PARAMS = {
    "densenet121": (32, (6, 12, 24, 16), 64),
    "densenet161": (48, (6, 12, 36, 24), 96),
    "densenet169": (32, (6, 12, 32, 32), 64),
    "densenet201": (32, (6, 12, 48, 32), 64),
}


@ModelRegistry.register(list(DENSENET_PARAMS), "cnn")
def build_densenet(cfg: Any) -> DenseNet:
    name = cfg_get(cfg, "name", "densenet121")
    growth, blocks, init_f = DENSENET_PARAMS.get(name, (32, (6, 12, 24, 16), 64))
    return DenseNet(
        growth_rate=int(cfg_get(cfg, "growth_rate", growth)),
        block_config=tuple(cfg_get(cfg, "block_config", blocks)),
        num_init_features=int(cfg_get(cfg, "num_init_features", init_f)),
        bn_size=int(cfg_get(cfg, "bn_size", 4)),
        dropout_rate=float(cfg_get(cfg, "dropout_rate", 0.0)),
        num_classes=int(cfg_get(cfg, "num_classes", 2)),
        in_channels=int(cfg_get(cfg, "in_channels", 1)),
        dtype=resolve_dtype(cfg),
    )
