"""Int8 post-training-quantized serving path (TPU-native).

The v5e MXU executes s8×s8→s32 contractions at twice the bf16 rate, so for
conv/matmul-bound models an int8 inference path is the remaining 2× after
bf16. This module provides PTQ with **zero model rewrites and zero
checkpoint surgery**: a flax method interceptor (`quantized_call`) swaps
every large `nn.Dense` / `nn.Conv` contraction inside an `apply` for

    y = dot(q(x) :: s8, q(W) :: s8) :: s32  ·  (s_x · s_w)   (+ bias)

with a dynamic per-tensor activation scale s_x = max|x|/127 and static
per-output-channel weight scales s_w. Weights are quantized inside the
traced program from the live (f32/bf16) params; in a `lax.scan` serving
loop the weight quantization is loop-invariant and XLA hoists it out of
the body, so its steady-state cost is zero — any existing variables tree
serves quantized as-is.

What is NOT quantized (config-gated):
- depthwise/grouped convolutions (`feature_group_count > 1`): they run on
  the VPU, int8 buys nothing and costs two rounding passes;
- thin layers (in or out features below `min_features`): classifier heads
  (2 classes), SE squeeze convs — negligible FLOPs, highest relative
  rounding damage;
- anything outside nn.Dense/nn.Conv — notably the Swin Pallas serving
  kernels (ops/attention.py), whose W-MSA core is deliberately f32-in-VMEM
  (docs/DESIGN.md: bf16 operands measured 2.5× slower at N=49; int8 tiles
  (32,128) are even more hostile to 49-token sublanes).

The reference has no serving subsystem at all (SURVEY §2); this is a
deployment feature of the rebuild, validated by agreement tests
(tests/unit/test_quantize.py) and gated behind explicit opt-in
(`InferenceEngine(quantize="int8")`, `bench.py --quant int8`).

CAVEAT (dynamic scales are batch-global): s_x = max|x|/127 is computed over
the WHOLE batch, so in bucketed serving a sample's quantization grid — and
therefore its logits near the decision boundary — depends on which other
requests it was co-batched with. Identical requests can get slightly
different probabilities across batches. Acceptable for an opt-in
throughput path; a per-sample scale (axis-0 max) would restore request
determinism at the cost of an extra broadcast multiply per layer. Measured
on v5e the int8 path is SLOWER than bf16 anyway (docs/DESIGN.md), so it
ships as a documented negative result, not a recommended mode.
"""
from __future__ import annotations

import dataclasses
from contextlib import contextmanager
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """What to quantize.

    min_features: skip layers whose contraction is thinner than this on
        either side — their FLOPs are noise and heads are accuracy-critical.
    skip_depthwise: leave grouped convs (depthwise MBConv stages) alone.
    accumulate_int32: use the MXU s8×s8→s32 path (False falls back to
        dequantize-before-dot, for numerics A/B only).
    """

    min_features: int = 32
    skip_depthwise: bool = True
    accumulate_int32: bool = True


def _quantize_weight(w: jnp.ndarray, out_axis: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8: returns (w_q, s_w) with
    w ≈ w_q · s_w (s_w broadcastable against the s32 product's last dim)."""
    wf = w.astype(jnp.float32)
    axes = tuple(i for i in range(w.ndim) if i != out_axis)
    s = jnp.max(jnp.abs(wf), axis=axes, keepdims=False) / 127.0
    s = jnp.maximum(s, 1e-12)
    shape = [1] * w.ndim
    shape[out_axis] = w.shape[out_axis]
    wq = jnp.clip(jnp.round(wf / s.reshape(shape)), -127, 127).astype(jnp.int8)
    return wq, s


def _quantize_act(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric dynamic per-tensor int8 for activations."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf)) / 127.0
    s = jnp.maximum(s, 1e-12)
    xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return xq, s


def _out_dtype(mod: nn.Module, x: jnp.ndarray) -> jnp.dtype:
    # our modules always pass dtype explicitly; promote like flax otherwise
    return mod.dtype if mod.dtype is not None else jnp.promote_types(
        x.dtype, mod.param_dtype)


def _dense_int8(mod: nn.Dense, x: jnp.ndarray, cfg: QuantConfig) -> jnp.ndarray:
    kernel = mod.param("kernel", mod.kernel_init,
                       (x.shape[-1], mod.features), mod.param_dtype)
    bias = mod.param("bias", mod.bias_init, (mod.features,),
                     mod.param_dtype) if mod.use_bias else None
    wq, sw = _quantize_weight(kernel, out_axis=1)
    xq, sx = _quantize_act(x)
    if cfg.accumulate_int32:
        y = jax.lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (sx * sw)
    else:
        y = (xq.astype(jnp.float32) * sx) @ (wq.astype(jnp.float32) * sw)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(_out_dtype(mod, x))


def _conv_padding(mod: nn.Conv):
    pad = mod.padding
    if isinstance(pad, str):
        return pad
    if isinstance(pad, int):
        return [(pad, pad)] * len(mod.kernel_size)
    out = []
    for p in pad:
        out.append((p, p) if isinstance(p, int) else tuple(p))
    return out


def _conv_int8(mod: nn.Conv, x: jnp.ndarray, cfg: QuantConfig) -> jnp.ndarray:
    ks = tuple(mod.kernel_size)
    in_features = x.shape[-1]
    kernel_shape = ks + (in_features // mod.feature_group_count, mod.features)
    kernel = mod.param("kernel", mod.kernel_init, kernel_shape, mod.param_dtype)
    bias = mod.param("bias", mod.bias_init, (mod.features,),
                     mod.param_dtype) if mod.use_bias else None
    nd = len(ks)
    dn = {1: ("NWC", "WIO", "NWC"),
          2: ("NHWC", "HWIO", "NHWC"),
          3: ("NDHWC", "DHWIO", "NDHWC")}[nd]
    strides = mod.strides if mod.strides is not None else (1,) * nd
    if isinstance(strides, int):
        strides = (strides,) * nd
    wq, sw = _quantize_weight(kernel, out_axis=kernel.ndim - 1)
    xq, sx = _quantize_act(x)
    if cfg.accumulate_int32:
        y = jax.lax.conv_general_dilated(
            xq, wq, window_strides=tuple(strides), padding=_conv_padding(mod),
            dimension_numbers=dn,
            feature_group_count=mod.feature_group_count,
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (sx * sw)
    else:
        y = jax.lax.conv_general_dilated(
            xq.astype(jnp.float32) * sx,
            wq.astype(jnp.float32) * sw.reshape((1,) * nd + (1, -1)),
            window_strides=tuple(strides), padding=_conv_padding(mod),
            dimension_numbers=dn,
            feature_group_count=mod.feature_group_count)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(_out_dtype(mod, x))


def _eligible(mod: nn.Module, x: jnp.ndarray, cfg: QuantConfig) -> bool:
    if isinstance(mod, nn.Dense):
        return (x.shape[-1] >= cfg.min_features
                and mod.features >= cfg.min_features)
    if isinstance(mod, nn.Conv):
        if mod.feature_group_count > 1 and cfg.skip_depthwise:
            return False
        if not _all_ones(getattr(mod, "input_dilation", None)) or \
                not _all_ones(getattr(mod, "kernel_dilation", None)):
            return False
        if mod.mask is not None:
            return False
        cin = x.shape[-1] // mod.feature_group_count
        return cin >= cfg.min_features and mod.features >= cfg.min_features
    return False


def _all_ones(v) -> bool:
    if v is None or isinstance(v, int):
        return v in (None, 1)
    return all(int(d) == 1 for d in v)


def make_int8_interceptor(cfg: Optional[QuantConfig] = None):
    """A flax `nn.intercept_methods` interceptor implementing the PTQ path."""
    cfg = cfg or QuantConfig()

    def interceptor(next_fn, args, kwargs, context):
        mod = context.module
        if (context.method_name == "__call__" and args
                and isinstance(args[0], jnp.ndarray)
                and _eligible(mod, args[0], cfg)):
            if isinstance(mod, nn.Dense):
                return _dense_int8(mod, args[0], cfg)
            return _conv_int8(mod, args[0], cfg)
        return next_fn(*args, **kwargs)

    return interceptor


@contextmanager
def int8_serving(cfg: Optional[QuantConfig] = None):
    """Context manager: every model.apply inside runs Dense/Conv in int8.

        with int8_serving():
            logits = model.apply(variables, x, train=False)
    """
    with nn.intercept_methods(make_int8_interceptor(cfg)):
        yield


def quantized_apply(model: nn.Module, variables, *args,
                    cfg: Optional[QuantConfig] = None, **kwargs):
    """One-shot helper: `model.apply` under the int8 interceptor."""
    with int8_serving(cfg):
        return model.apply(variables, *args, **kwargs)
