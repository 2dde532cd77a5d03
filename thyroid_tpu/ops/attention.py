"""Pallas fused window-attention kernel (TPU).

The Swin hot loop (SURVEY §3.3: windowed MHSA is the prime fusion target).
One kernel instance computes, for a tile of windows and ALL heads at once:

    scores = (q·s) @ kᵀ + rel_pos_bias [+ shift_mask]
    probs  = softmax(scores)
    out    = probs @ v

entirely in VMEM — no HBM round-trips between the five ops. Token count N
(e.g. 49 for 7×7 windows) is zero-padded to the sublane multiple with an
additive −∞ key mask so padded positions get zero probability.

Used by models.vit.swin.WindowAttention when `use_pallas_attention` is set;
`interpret=True` makes the same kernel runnable on CPU for tests.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attention_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref,
                      *, scale: float, num_heads: int, n_tokens: int):
    """Block shapes: q/k/v/o (TW, H, Np, D); bias (H, Np, Np);
    mask (TW, Np, Np) additive (0 / −1e9, already includes pad masking).
    Window-batched matmuls per head — the attention matrix never leaves
    VMEM."""
    for h in range(num_heads):
        q = q_ref[:, h].astype(jnp.float32) * scale          # (TW, Np, D)
        k = k_ref[:, h].astype(jnp.float32)
        v = v_ref[:, h].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # (TW, Np, Np)
        scores = scores + bias_ref[h][None].astype(jnp.float32)
        scores = scores + mask_ref[:].astype(jnp.float32)
        scores = scores - scores.max(axis=-1, keepdims=True)
        e = jnp.exp(scores)
        probs = e / e.sum(axis=-1, keepdims=True)
        o_ref[:, h] = jax.lax.dot_general(
            probs, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def fused_window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    window_tile: int = 16,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """q/k/v: (BW, H, N, D) per-window tensors; bias: (H, N, N);
    mask: (nW, N, N) additive shift mask or None (BW % nW == 0).
    → (BW, H, N, D)."""
    if interpret is None:
        # compiled Mosaic kernels need a TPU; elsewhere run interpreted.
        # (The TPU plugin here registers as platform 'axon' with device kind
        # 'TPU v5 lite', so match the device kind too.)
        dev = jax.devices()[0]
        blob = f"{dev.platform} {getattr(dev, 'device_kind', '')}".lower()
        interpret = "tpu" not in blob
    bw, h, n, d = q.shape
    if scale is None:
        scale = d ** -0.5
    np_ = _round_up(n, 16)
    # d stays UNPADDED in HBM (the VMEM tile pads lanes internally) — an
    # explicit pad to 128 lanes would 4× the q/k/v/o HBM traffic at Swin's
    # head_dim 32 and cost more than keeping the attention matrix in VMEM
    # saves. Auto-size the window tile so blocks (+ f32 scores scratch) fit
    # well under the ~16 MB scoped VMEM limit with double buffering.
    dp = d
    lane_d = _round_up(d, 128)
    bytes_per_window = (4 * h * np_ * lane_d * q.dtype.itemsize
                        + np_ * np_ * 4 * 2)
    budget = 4 * 1024 * 1024
    tw = min(window_tile, bw, max(1, budget // bytes_per_window))
    while bw % tw:
        tw -= 1

    pad_qkv = ((0, 0), (0, 0), (0, np_ - n), (0, dp - d))
    qp = jnp.pad(q, pad_qkv)
    kp = jnp.pad(k, pad_qkv)
    vp = jnp.pad(v, pad_qkv)
    biasp = jnp.pad(bias, ((0, 0), (0, np_ - n), (0, np_ - n)))

    # additive mask per window: shift mask (broadcast over BW) + pad mask
    key_valid = jnp.arange(np_) < n                           # (Np,)
    pad_mask = jnp.where(key_valid, 0.0, NEG_INF)             # (Np,)
    pad_mask = jnp.broadcast_to(pad_mask[None, :], (np_, np_))[None]  # (1,Np,Np)
    if mask is not None:
        nw = mask.shape[0]
        m = jnp.pad(mask, ((0, 0), (0, np_ - n), (0, np_ - n)))
        m = jnp.tile(m, (bw // nw, 1, 1)) + pad_mask
    else:
        m = jnp.broadcast_to(pad_mask, (bw, np_, np_))

    kernel = functools.partial(_attention_kernel, scale=scale,
                               num_heads=h, n_tokens=n)
    out = pl.pallas_call(
        kernel,
        grid=(bw // tw,),
        in_specs=[
            pl.BlockSpec((tw, h, np_, dp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tw, h, np_, dp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tw, h, np_, dp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, np_, np_), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tw, np_, np_), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tw, h, np_, dp), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bw, h, np_, dp), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, biasp, m)
    return out[:, :, :n, :d]


def window_attention_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Plain-XLA reference of the same computation (for tests and as the
    default path)."""
    bw, h, n, d = q.shape
    if scale is None:
        scale = d ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32))
    scores = scores + bias[None].astype(jnp.float32)
    if mask is not None:
        nw = mask.shape[0]
        scores = scores.reshape(bw // nw, nw, h, n, n) + \
            mask[None, :, None].astype(jnp.float32)
        scores = scores.reshape(bw, h, n, n)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs,
                      v.astype(jnp.float32)).astype(q.dtype)
