"""EfficientNet family B0–B3 (flax, NHWC, MBConv + squeeze-excite).

The reference delegates to timm with a per-variant dropout table
(reference: src/models/cnn/efficientnet.py:16-70, VARIANT_CONFIG:19-24);
here the architecture (compound-scaled MBConv stack, SiLU, SE, stochastic
depth) is implemented from scratch.
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import DropPath
from ..registry import ModelRegistry, cfg_get, resolve_dtype

Dtype = Any

# (expand_ratio, channels, repeats, stride, kernel) — standard B0 plan
B0_PLAN = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)


def round_filters(f: int, width_mult: float, divisor: int = 8) -> int:
    f *= width_mult
    new_f = max(divisor, int(f + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * f:
        new_f += divisor
    return int(new_f)


def round_repeats(r: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * r))


class SqueezeExcite(nn.Module):
    in_features: int
    se_ratio: float = 0.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        squeezed = max(1, int(self.in_features * self.se_ratio))
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(squeezed, (1, 1), dtype=self.dtype)(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype)(s)
        return x * nn.sigmoid(s)


class ShiftDepthwiseConv(nn.Module):
    """Depthwise conv with nn.Conv-identical params (kernel (k,k,1,C), no
    bias) computed as k² shifted multiply-accumulates (ops/depthwise.py).
    MEASURED NEGATIVE RESULT on v5e (round 2): bench.py efficientnet_b0
    bf16 B=256 drops 16.7k → 4.1k img/s with this path — XLA's
    EmitDepthwiseAllBatchInLanes emitter beats the unrolled slice-MAC loop
    fusion ~4× end-to-end despite dominating the device-time profile.
    Kept as an opt-in (`dw_shift_conv: true`) with param path/shape
    matching nn.Conv(feature_group_count=C) exactly, so checkpoints and
    the torch importer are unaffected either way."""

    features: int
    kernel: int
    strides: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ...ops.depthwise import shift_depthwise_conv

        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, 1, self.features))
        return shift_depthwise_conv(
            x.astype(self.dtype), w.astype(self.dtype), self.strides)


class PallasDepthwiseConv(nn.Module):
    """Stride-1 depthwise conv as the VMEM-resident Pallas stencil kernel
    (ops/depthwise_pallas.py). Param path/shape match
    nn.Conv(feature_group_count=C) exactly — checkpoints, the torch
    importer and the train path (which keeps XLA's conv + autodiff) are
    unaffected. Grad-CAM-style grads flow through its custom_vjp."""

    features: int
    kernel: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ...ops.depthwise_pallas import depthwise_conv2d_pallas

        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, 1, self.features))
        return depthwise_conv2d_pallas(x.astype(self.dtype),
                                       w.astype(self.dtype))


class MBConv(nn.Module):
    out_features: int
    expand_ratio: int
    kernel: int
    strides: int
    drop_path_rate: float = 0.0
    dw_shift: bool = False
    dw_pallas: bool | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_f = x.shape[-1]
        residual = x
        h = x
        expanded = in_f * self.expand_ratio
        n_conv = 0
        if self.expand_ratio != 1:
            h = nn.Conv(expanded, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"Conv_{n_conv}")(h)
            n_conv += 1
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype)(h)
            h = nn.silu(h)
        # torch-symmetric k//2 padding (timm non-TF variants), not XLA SAME —
        # SAME is asymmetric under stride 2, which breaks weight-import parity
        kp = self.kernel // 2
        # default OFF: measured 2.8x SLOWER end-to-end on v5e (17.97k ->
        # 6.4k img/s) — XLA's depthwise emitter is already at the VPU FMA
        # ceiling with free tap addressing; see ops/depthwise_pallas.py
        use_pallas = bool(self.dw_pallas)
        if self.dw_shift:
            # explicit Conv_{n} name keeps the param tree identical to the
            # nn.Conv path (auto-naming counts per-class, which would shift)
            h = ShiftDepthwiseConv(expanded, self.kernel, self.strides,
                                   dtype=self.dtype,
                                   name=f"Conv_{n_conv}")(h)
        elif use_pallas and not train and self.strides == 1:
            h = PallasDepthwiseConv(expanded, self.kernel, dtype=self.dtype,
                                    name=f"Conv_{n_conv}")(h)
        else:
            h = nn.Conv(expanded, (self.kernel, self.kernel),
                        strides=(self.strides, self.strides),
                        padding=[(kp, kp), (kp, kp)],
                        feature_group_count=expanded, use_bias=False,
                        dtype=self.dtype, name=f"Conv_{n_conv}")(h)
        n_conv += 1
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(h)
        h = nn.silu(h)
        h = SqueezeExcite(in_f, dtype=self.dtype)(h)
        h = nn.Conv(self.out_features, (1, 1), use_bias=False,
                    dtype=self.dtype, name=f"Conv_{n_conv}")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(h)
        if self.strides == 1 and in_f == self.out_features:
            h = DropPath(self.drop_path_rate)(h, deterministic=not train)
            h = h + residual
        return h


class EfficientNet(nn.Module):
    width_mult: float = 1.0
    depth_mult: float = 1.0
    dropout_rate: float = 0.2
    drop_path_rate: float = 0.2
    num_classes: int = 2
    in_channels: int = 1
    dw_shift: bool = False
    dw_pallas: bool | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 capture: bool = False) -> jnp.ndarray:
        stem = round_filters(32, self.width_mult)
        x = nn.Conv(stem, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="stem_bn")(x)
        x = nn.silu(x)

        total_blocks = sum(round_repeats(r, self.depth_mult) for _, _, r, _, _ in B0_PLAN)
        block_idx = 0
        for stage, (expand, ch, repeats, stride, kernel) in enumerate(B0_PLAN):
            out_f = round_filters(ch, self.width_mult)
            for i in range(round_repeats(repeats, self.depth_mult)):
                dpr = self.drop_path_rate * block_idx / max(total_blocks, 1)
                x = MBConv(out_f, expand, kernel, stride if i == 0 else 1,
                           drop_path_rate=dpr, dw_shift=self.dw_shift,
                           dw_pallas=self.dw_pallas, dtype=self.dtype,
                           name=f"mbconv{stage}_{i}")(x, train)
                block_idx += 1

        head_f = round_filters(1280, self.width_mult)
        x = nn.Conv(head_f, (1, 1), use_bias=False, dtype=self.dtype,
                    name="head_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="head_bn")(x)
        x = nn.silu(x)
        if capture:
            self.sow("intermediates", "features", x)
        x = x.mean(axis=(1, 2))
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="classifier")(x)


EFFICIENTNET_PARAMS = {
    # name: (width_mult, depth_mult, resolution, dropout) — reference
    # VARIANT_CONFIG (src/models/cnn/efficientnet.py:19-24)
    "efficientnet_b0": (1.0, 1.0, 224, 0.2),
    "efficientnet_b1": (1.0, 1.1, 240, 0.2),
    "efficientnet_b2": (1.1, 1.2, 260, 0.3),
    "efficientnet_b3": (1.2, 1.4, 300, 0.3),
}


@ModelRegistry.register(list(EFFICIENTNET_PARAMS), "cnn")
def build_efficientnet(cfg: Any) -> EfficientNet:
    name = cfg_get(cfg, "name", "efficientnet_b0")
    wm, dm, _, drop = EFFICIENTNET_PARAMS.get(name, (1.0, 1.0, 224, 0.2))
    return EfficientNet(
        width_mult=float(cfg_get(cfg, "width_mult", wm)),
        depth_mult=float(cfg_get(cfg, "depth_mult", dm)),
        dropout_rate=float(cfg_get(cfg, "dropout_rate", drop)),
        drop_path_rate=float(cfg_get(cfg, "drop_path_rate", 0.2)),
        num_classes=int(cfg_get(cfg, "num_classes", 2)),
        in_channels=int(cfg_get(cfg, "in_channels", 1)),
        dw_shift=bool(cfg_get(cfg, "dw_shift_conv", False)),
        dw_pallas=cfg_get(cfg, "dw_pallas_conv", None),
        dtype=resolve_dtype(cfg),
    )
