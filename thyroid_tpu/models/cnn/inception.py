"""Inception v3 / v4 (flax, NHWC).

The reference delegates to timm with aux-logits handling
(reference: src/models/cnn/inception.py:13-63); here both architectures are
implemented from scratch. InceptionV3 keeps the auxiliary classifier: in
train mode it returns (logits, aux_logits) — the training engine handles the
tuple exactly like the reference module does
(reference: src/training/lightning_modules.py:110-114).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..registry import ModelRegistry, cfg_get, resolve_dtype

Dtype = Any


class ConvBN(nn.Module):
    features: int
    kernel: Sequence[int] = (3, 3)
    strides: int = 1
    padding: str | Sequence = "SAME"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.features, tuple(self.kernel),
                    strides=(self.strides, self.strides),
                    padding=self.padding, use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype)(x)
        return nn.relu(x)


def _branch_pool(x: jnp.ndarray, count_include_pad: bool = True) -> jnp.ndarray:
    """3x3 s1 SAME average-pool branch. torchvision inception_v3 divides by
    the full window at borders (count_include_pad=True); Cadene/timm
    inception_v4 divides by the number of REAL taps (False) — per-variant
    flag so imported weights see the exact reference activations."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME",
                       count_include_pad=count_include_pad)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b1 = ConvBN(64, (1, 1), dtype=self.dtype)(x, train)
        b2 = ConvBN(48, (1, 1), dtype=self.dtype)(x, train)
        b2 = ConvBN(64, (5, 5), dtype=self.dtype)(b2, train)
        b3 = ConvBN(64, (1, 1), dtype=self.dtype)(x, train)
        b3 = ConvBN(96, (3, 3), dtype=self.dtype)(b3, train)
        b3 = ConvBN(96, (3, 3), dtype=self.dtype)(b3, train)
        b4 = ConvBN(self.pool_features, (1, 1), dtype=self.dtype)(_branch_pool(x), train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b1 = ConvBN(384, (3, 3), strides=2, padding="VALID", dtype=self.dtype)(x, train)
        b2 = ConvBN(64, (1, 1), dtype=self.dtype)(x, train)
        b2 = ConvBN(96, (3, 3), dtype=self.dtype)(b2, train)
        b2 = ConvBN(96, (3, 3), strides=2, padding="VALID", dtype=self.dtype)(b2, train)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b1, b2, b3], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c7 = self.channels_7x7
        b1 = ConvBN(192, (1, 1), dtype=self.dtype)(x, train)
        b2 = ConvBN(c7, (1, 1), dtype=self.dtype)(x, train)
        b2 = ConvBN(c7, (1, 7), dtype=self.dtype)(b2, train)
        b2 = ConvBN(192, (7, 1), dtype=self.dtype)(b2, train)
        b3 = ConvBN(c7, (1, 1), dtype=self.dtype)(x, train)
        b3 = ConvBN(c7, (7, 1), dtype=self.dtype)(b3, train)
        b3 = ConvBN(c7, (1, 7), dtype=self.dtype)(b3, train)
        b3 = ConvBN(c7, (7, 1), dtype=self.dtype)(b3, train)
        b3 = ConvBN(192, (1, 7), dtype=self.dtype)(b3, train)
        b4 = ConvBN(192, (1, 1), dtype=self.dtype)(_branch_pool(x), train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b1 = ConvBN(192, (1, 1), dtype=self.dtype)(x, train)
        b1 = ConvBN(320, (3, 3), strides=2, padding="VALID", dtype=self.dtype)(b1, train)
        b2 = ConvBN(192, (1, 1), dtype=self.dtype)(x, train)
        b2 = ConvBN(192, (1, 7), dtype=self.dtype)(b2, train)
        b2 = ConvBN(192, (7, 1), dtype=self.dtype)(b2, train)
        b2 = ConvBN(192, (3, 3), strides=2, padding="VALID", dtype=self.dtype)(b2, train)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b1, b2, b3], axis=-1)


class InceptionE(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b1 = ConvBN(320, (1, 1), dtype=self.dtype)(x, train)
        b2 = ConvBN(384, (1, 1), dtype=self.dtype)(x, train)
        b2a = ConvBN(384, (1, 3), dtype=self.dtype)(b2, train)
        b2b = ConvBN(384, (3, 1), dtype=self.dtype)(b2, train)
        b2 = jnp.concatenate([b2a, b2b], axis=-1)
        b3 = ConvBN(448, (1, 1), dtype=self.dtype)(x, train)
        b3 = ConvBN(384, (3, 3), dtype=self.dtype)(b3, train)
        b3a = ConvBN(384, (1, 3), dtype=self.dtype)(b3, train)
        b3b = ConvBN(384, (3, 1), dtype=self.dtype)(b3, train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        b4 = ConvBN(192, (1, 1), dtype=self.dtype)(_branch_pool(x), train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionV3(nn.Module):
    num_classes: int = 2
    in_channels: int = 1
    dropout_rate: float = 0.5
    aux_logits: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 capture: bool = False):
        x = ConvBN(32, (3, 3), strides=2, padding="VALID", dtype=self.dtype)(x, train)
        x = ConvBN(32, (3, 3), padding="VALID", dtype=self.dtype)(x, train)
        x = ConvBN(64, (3, 3), dtype=self.dtype)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = ConvBN(80, (1, 1), dtype=self.dtype)(x, train)
        x = ConvBN(192, (3, 3), padding="VALID", dtype=self.dtype)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = InceptionA(32, dtype=self.dtype)(x, train)
        x = InceptionA(64, dtype=self.dtype)(x, train)
        x = InceptionA(64, dtype=self.dtype)(x, train)
        x = InceptionB(dtype=self.dtype)(x, train)
        x = InceptionC(128, dtype=self.dtype)(x, train)
        x = InceptionC(160, dtype=self.dtype)(x, train)
        x = InceptionC(160, dtype=self.dtype)(x, train)
        x = InceptionC(192, dtype=self.dtype)(x, train)
        aux = None
        if self.aux_logits:
            # computed unconditionally so the param structure is identical in
            # train and eval; the tuple is only *returned* in train mode
            a = nn.avg_pool(x, (5, 5), strides=(3, 3), padding="VALID")
            a = ConvBN(128, (1, 1), dtype=self.dtype, name="aux_conv0")(a, train)
            # canonical 299² input reaches here at 5×5, where VALID matches
            # torch (→1×1). Below 5×5 (e.g. a 224² run) VALID would emit a
            # ZERO-size grid and the mean below would be NaN — fall back to
            # SAME (weight shapes unchanged, so imports are unaffected).
            aux_pad = "VALID" if min(a.shape[1], a.shape[2]) >= 5 else "SAME"
            a = ConvBN(768, (5, 5), padding=aux_pad, dtype=self.dtype,
                       name="aux_conv1")(a, train)
            a = a.mean(axis=(1, 2))
            aux = nn.Dense(self.num_classes, dtype=jnp.float32, name="aux_fc")(a)
            if not train:
                aux = None
        x = InceptionD(dtype=self.dtype)(x, train)
        x = InceptionE(dtype=self.dtype)(x, train)
        x = InceptionE(dtype=self.dtype)(x, train)
        if capture:
            self.sow("intermediates", "features", x)
        x = x.mean(axis=(1, 2))
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)
        if aux is not None:
            return logits, aux
        return logits


# ---------------------------------------------------------------------------
# Inception v4
# ---------------------------------------------------------------------------

class InceptionV4A(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b1 = ConvBN(96, (1, 1), dtype=self.dtype)(x, train)
        b2 = ConvBN(64, (1, 1), dtype=self.dtype)(x, train)
        b2 = ConvBN(96, (3, 3), dtype=self.dtype)(b2, train)
        b3 = ConvBN(64, (1, 1), dtype=self.dtype)(x, train)
        b3 = ConvBN(96, (3, 3), dtype=self.dtype)(b3, train)
        b3 = ConvBN(96, (3, 3), dtype=self.dtype)(b3, train)
        b4 = ConvBN(96, (1, 1), dtype=self.dtype)(
            _branch_pool(x, count_include_pad=False), train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionV4B(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b1 = ConvBN(384, (1, 1), dtype=self.dtype)(x, train)
        b2 = ConvBN(192, (1, 1), dtype=self.dtype)(x, train)
        b2 = ConvBN(224, (1, 7), dtype=self.dtype)(b2, train)
        b2 = ConvBN(256, (7, 1), dtype=self.dtype)(b2, train)
        b3 = ConvBN(192, (1, 1), dtype=self.dtype)(x, train)
        b3 = ConvBN(192, (7, 1), dtype=self.dtype)(b3, train)
        b3 = ConvBN(224, (1, 7), dtype=self.dtype)(b3, train)
        b3 = ConvBN(224, (7, 1), dtype=self.dtype)(b3, train)
        b3 = ConvBN(256, (1, 7), dtype=self.dtype)(b3, train)
        b4 = ConvBN(128, (1, 1), dtype=self.dtype)(
            _branch_pool(x, count_include_pad=False), train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionV4C(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b1 = ConvBN(256, (1, 1), dtype=self.dtype)(x, train)
        b2 = ConvBN(384, (1, 1), dtype=self.dtype)(x, train)
        b2a = ConvBN(256, (1, 3), dtype=self.dtype)(b2, train)
        b2b = ConvBN(256, (3, 1), dtype=self.dtype)(b2, train)
        b2 = jnp.concatenate([b2a, b2b], axis=-1)
        b3 = ConvBN(384, (1, 1), dtype=self.dtype)(x, train)
        # Cadene/timm inception_v4 Inception_C orientation: 448 via (3,1),
        # 512 via (1,3), then the split heads (1,3)/(3,1) — the mirrored
        # order breaks pretrained import (conv shape mismatch)
        b3 = ConvBN(448, (3, 1), dtype=self.dtype)(b3, train)
        b3 = ConvBN(512, (1, 3), dtype=self.dtype)(b3, train)
        b3a = ConvBN(256, (1, 3), dtype=self.dtype)(b3, train)
        b3b = ConvBN(256, (3, 1), dtype=self.dtype)(b3, train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        b4 = ConvBN(256, (1, 1), dtype=self.dtype)(
            _branch_pool(x, count_include_pad=False), train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionV4(nn.Module):
    num_classes: int = 2
    in_channels: int = 1
    dropout_rate: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 capture: bool = False):
        # stem
        x = ConvBN(32, (3, 3), strides=2, padding="VALID", dtype=self.dtype)(x, train)
        x = ConvBN(32, (3, 3), padding="VALID", dtype=self.dtype)(x, train)
        x = ConvBN(64, (3, 3), dtype=self.dtype)(x, train)
        p1 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        p2 = ConvBN(96, (3, 3), strides=2, padding="VALID", dtype=self.dtype)(x, train)
        x = jnp.concatenate([p1, p2], axis=-1)
        q1 = ConvBN(64, (1, 1), dtype=self.dtype)(x, train)
        q1 = ConvBN(96, (3, 3), padding="VALID", dtype=self.dtype)(q1, train)
        q2 = ConvBN(64, (1, 1), dtype=self.dtype)(x, train)
        q2 = ConvBN(64, (1, 7), dtype=self.dtype)(q2, train)
        q2 = ConvBN(64, (7, 1), dtype=self.dtype)(q2, train)
        q2 = ConvBN(96, (3, 3), padding="VALID", dtype=self.dtype)(q2, train)
        x = jnp.concatenate([q1, q2], axis=-1)
        r1 = ConvBN(192, (3, 3), strides=2, padding="VALID", dtype=self.dtype)(x, train)
        r2 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = jnp.concatenate([r1, r2], axis=-1)
        # 4×A, reduction, 7×B, reduction, 3×C
        for _ in range(4):
            x = InceptionV4A(dtype=self.dtype)(x, train)
        b1 = ConvBN(384, (3, 3), strides=2, padding="VALID", dtype=self.dtype)(x, train)
        b2 = ConvBN(192, (1, 1), dtype=self.dtype)(x, train)
        b2 = ConvBN(224, (3, 3), dtype=self.dtype)(b2, train)
        b2 = ConvBN(256, (3, 3), strides=2, padding="VALID", dtype=self.dtype)(b2, train)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = jnp.concatenate([b1, b2, b3], axis=-1)
        for _ in range(7):
            x = InceptionV4B(dtype=self.dtype)(x, train)
        c1 = ConvBN(192, (1, 1), dtype=self.dtype)(x, train)
        c1 = ConvBN(192, (3, 3), strides=2, padding="VALID", dtype=self.dtype)(c1, train)
        c2 = ConvBN(256, (1, 1), dtype=self.dtype)(x, train)
        c2 = ConvBN(256, (1, 7), dtype=self.dtype)(c2, train)
        c2 = ConvBN(320, (7, 1), dtype=self.dtype)(c2, train)
        c2 = ConvBN(320, (3, 3), strides=2, padding="VALID", dtype=self.dtype)(c2, train)
        c3 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = jnp.concatenate([c1, c2, c3], axis=-1)
        for _ in range(3):
            x = InceptionV4C(dtype=self.dtype)(x, train)
        if capture:
            self.sow("intermediates", "features", x)
        x = x.mean(axis=(1, 2))
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)


@ModelRegistry.register(["inception_v3", "inception_v4"], "cnn")
def build_inception(cfg: Any):
    name = cfg_get(cfg, "name", "inception_v3")
    common = dict(
        num_classes=int(cfg_get(cfg, "num_classes", 2)),
        in_channels=int(cfg_get(cfg, "in_channels", 1)),
        dropout_rate=float(cfg_get(cfg, "dropout_rate", 0.5)),
        dtype=resolve_dtype(cfg),
    )
    if name == "inception_v4":
        return InceptionV4(**common)
    return InceptionV3(aux_logits=bool(cfg_get(cfg, "aux_logits", True)), **common)
