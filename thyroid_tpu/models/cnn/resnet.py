"""ResNet family (flax, NHWC, fused conv+BN+act blocks).

Rebuilds the reference's ResNet wrapper capabilities from scratch — the
reference wraps torchvision backbones with a grayscale conv1 swap and fc head
swap (reference: src/models/cnn/resnet.py:55-131); here the architecture
itself is implemented (no torchvision), with `in_channels` native and the
standard 18/34/50/101 layer plans.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..registry import ModelRegistry, cfg_get, resolve_dtype

Dtype = Any


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    strides: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    padding=[(pad, pad), (pad, pad)],  # torch-style symmetric
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        if self.act:
            x = nn.relu(x)
        return x


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        y = ConvBN(self.features, 3, self.strides, dtype=self.dtype)(x, train)
        y = ConvBN(self.features, 3, 1, act=False, dtype=self.dtype)(y, train)
        if residual.shape != y.shape:
            residual = ConvBN(self.features, 1, self.strides, act=False,
                              dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    expansion: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        out_feat = self.features * self.expansion
        y = ConvBN(self.features, 1, 1, dtype=self.dtype)(x, train)
        y = ConvBN(self.features, 3, self.strides, dtype=self.dtype)(y, train)
        y = ConvBN(out_feat, 1, 1, act=False, dtype=self.dtype)(y, train)
        if residual.shape != y.shape:
            residual = ConvBN(out_feat, 1, self.strides, act=False,
                              dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(y + residual)


class SpatialAttention(nn.Module):
    """Spatial attention helper: sigmoid(1×1 conv) gate over the feature
    map, returning (attended, attention). Parity with the reference's
    retained-but-unwired helper (reference: src/models/cnn/resnet.py:24-35
    — its integration points are commented out there too; kept here for
    the same optional quality-aware wiring)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        attention = nn.sigmoid(nn.Conv(1, (1, 1), dtype=self.dtype)(x))
        return x * attention, attention


class QualityEncoder(nn.Module):
    """Encode per-image quality scores (B, 3) → (B, hidden_dim) features
    (reference: src/models/cnn/resnet.py:37-52)."""

    hidden_dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, quality_scores: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype)(quality_scores))
        return nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype)(x))


class ResNet(nn.Module):
    block: str = "bottleneck"            # basic | bottleneck
    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    num_classes: int = 2
    in_channels: int = 1
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 capture: bool = False) -> jnp.ndarray:
        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        x = nn.Conv(self.width, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, n_blocks in enumerate(self.layers):
            feats = self.width * 2 ** stage
            for i in range(n_blocks):
                strides = 2 if (stage > 0 and i == 0) else 1
                x = block_cls(feats, strides, dtype=self.dtype,
                              name=f"layer{stage + 1}_{i}")(x, train)
        if capture:
            # last conv feature map for GradCAM (reference hooks the final
            # conv features — scripts/generate_densenet_gradcam.py:47)
            self.sow("intermediates", "features", x)
        x = x.mean(axis=(1, 2))
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)


RESNET_PARAMS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
}


@ModelRegistry.register(list(RESNET_PARAMS), "cnn")
def build_resnet(cfg: Any) -> ResNet:
    name = cfg_get(cfg, "name", "resnet50")
    block, layers = RESNET_PARAMS.get(name, ("bottleneck", (3, 4, 6, 3)))
    return ResNet(
        block=str(cfg_get(cfg, "block", block)),
        layers=tuple(cfg_get(cfg, "layers", layers)),
        width=int(cfg_get(cfg, "width", 64)),
        num_classes=int(cfg_get(cfg, "num_classes", 2)),
        in_channels=int(cfg_get(cfg, "in_channels", 1)),
        dropout_rate=float(cfg_get(cfg, "dropout_rate", 0.0)),
        dtype=resolve_dtype(cfg),
    )
