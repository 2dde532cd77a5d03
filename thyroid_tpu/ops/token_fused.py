"""Token-major fused Pallas kernels (TPU serving path).

Profiling swin_tiny on v5e (docs/DESIGN.md round 2) showed the W-MSA Pallas
kernel leaves two XLA cost centres around it: the pre-norm LayerNorms
(XLA lowers them as multi-output convert+reduce fusions in a token-lane
layout, ~1.3 ms each on the stage-1 (64,3136,96) tensor) and the MLP whose
4C-wide hidden tensor makes an HBM round-trip. Both are token-pointwise, so
they fuse cleanly in TOKEN-2D form — x viewed as (B·L, C), a bitcast of the
residual stream — where Mosaic sees plain (tokens, C) @ (C, out) matmuls
with no window structure, no sublane reshapes, and MXU-friendly M.

Kernels (all eval/serving — no autodiff; training keeps the XLA path):
- fused_ln_matmul:        y = LN(x) @ W + b          (norm1 + QKV proj)
- fused_ln_mlp_residual:  y = x + fc2(gelu(fc1(LN(x))))   (norm2 + MLP)

LN uses flax's fast-variance numerics (f32 stats, E[x²]−μ²); matmul
operands are cast to the model compute dtype with f32 accumulation, and
intermediate activations are rounded to the compute dtype between layers to
match the XLA Dense → gelu → Dense chain bit-for-bit at f32.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tpu_platform import is_tpu




def _erf(x):
    """erf via Abramowitz–Stegun 7.1.26 (max abs err 1.5e-7): Mosaic has no
    erf/erfc lowering, and 1.5e-7 on erf is ~1e-7 absolute on gelu — far
    below bf16 serving resolution and the f32 parity tolerances."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exactish(x):
    """erf-based (non-tanh) gelu using the in-kernel erf above."""
    return 0.5 * x * (1.0 + _erf(x * (2 ** -0.5)))


def _ln_rows(x, g, b, eps):
    """flax LayerNorm numerics on (TB, C) rows, f32 in/out."""
    mu = x.mean(axis=-1, keepdims=True)
    var = jnp.maximum(0.0, (x * x).mean(axis=-1, keepdims=True) - mu * mu)
    mul = jax.lax.rsqrt(var + eps) * g
    return (x - mu) * mul + b


def _pick_block(total: int, limit: int, multiple: int = 8) -> int:
    """Largest divisor of `total` that is ≤ limit AND a multiple of
    `multiple` (Mosaic requires sublane blocks %8 / lane blocks %128, unless
    the block spans the whole dimension). Falls back to `total` itself —
    always legal — when no such divisor exists (e.g. tiny init shapes)."""
    for blk in range(min(total, max(multiple, limit)), multiple - 1, -1):
        if total % blk == 0 and blk % multiple == 0:
            return blk
    return total


# ---------------------------------------------------------------------------
# LN + matmul  (norm1 + QKV projection)
# ---------------------------------------------------------------------------


def _ln_matmul_kernel(x_ref, g_ref, b_ref, w_ref, wb_ref, o_ref,
                      *, eps: float, has_bias: bool):
    x = x_ref[:].astype(jnp.float32)
    xn = _ln_rows(x, g_ref[:].astype(jnp.float32),
                  b_ref[:].astype(jnp.float32), eps)
    xn = xn.astype(w_ref.dtype)
    y = jax.lax.dot_general(xn, w_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if has_bias:
        y = y + wb_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


def fused_ln_matmul(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    *,
    eps: float = 1e-6,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """x (..., C) → LN(x) @ w + b with LN fused into the matmul's VMEM pass.
    Leading dims are flattened to tokens (a bitcast) and restored."""
    if interpret is None:
        interpret = not is_tpu()
    *lead, c = x.shape
    out_dim = w.shape[1]
    t = 1
    for d in lead:
        t *= d
    x2 = x.reshape(t, c)
    cdt = x.dtype
    wc = w.astype(cdt)
    has_bias = b is not None
    b2 = (b if has_bias else jnp.zeros((out_dim,), jnp.float32)) \
        .astype(jnp.float32).reshape(1, out_dim)

    # big token blocks amortize Mosaic's per-grid-step overhead (~1 µs):
    # at 4 MB the stage-1 MLP ran ~900 steps and the stepping cost rivalled
    # the matmuls; 10 MB halves the step count (VMEM is 16 MB/core)
    budget = 10 * 1024 * 1024
    wbytes = c * out_dim * jnp.dtype(cdt).itemsize
    row_bytes = (c + out_dim) * (jnp.dtype(cdt).itemsize + 4)
    tb = _pick_block(t, max(8, (budget - wbytes) // max(1, row_bytes)))

    kernel = functools.partial(_ln_matmul_kernel, eps=float(eps),
                               has_bias=has_bias)
    const = lambda i: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(t // tb,),
        in_specs=[
            pl.BlockSpec((tb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, out_dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_dim), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, out_dim), cdt),
        interpret=interpret,
    )(x2, ln_scale.astype(jnp.float32).reshape(1, c),
      ln_bias.astype(jnp.float32).reshape(1, c), wc, b2)
    return out.reshape(*lead, out_dim)


# ---------------------------------------------------------------------------
# LN + MLP + residual  (norm2 + fc1 + gelu + fc2 + skip)
# ---------------------------------------------------------------------------


def _ln_mlp_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   o_ref, acc_ref, *, eps: float, n_hc: int):
    hc_i = pl.program_id(1)
    x = x_ref[:].astype(jnp.float32)
    xn = _ln_rows(x, g_ref[:].astype(jnp.float32),
                  b_ref[:].astype(jnp.float32), eps)
    xn = xn.astype(w1_ref.dtype)
    h = jax.lax.dot_general(xn, w1_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    # round to the compute dtype between layers, like the XLA Dense chain
    h = _gelu_exactish(h.astype(w1_ref.dtype).astype(jnp.float32))
    h = h.astype(w2_ref.dtype)
    part = jax.lax.dot_general(h, w2_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    @pl.when(hc_i == 0)
    def _init():
        acc_ref[:] = x + b2_ref[:].astype(jnp.float32) + part

    @pl.when(hc_i > 0)
    def _acc():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(hc_i == n_hc - 1)
    def _out():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def fused_ln_mlp_residual(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    eps: float = 1e-6,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """x (..., C) → x + fc2(gelu(fc1(LN(x)))) in one kernel: the 4C-wide
    hidden tensor never leaves VMEM. The hidden dim is chunked over a
    sequential grid axis with an f32 accumulator in scratch; the residual
    read rides the same x block the LN uses."""
    if interpret is None:
        interpret = not is_tpu()
    *lead, c = x.shape
    hdim = w1.shape[1]
    t = 1
    for d in lead:
        t *= d
    x2 = x.reshape(t, c)
    cdt = x.dtype
    isz = jnp.dtype(cdt).itemsize

    budget = 10 * 1024 * 1024
    hc = _pick_block(hdim, 512, multiple=128)
    wbytes = (c * hc + hc * c) * isz
    row_bytes = c * (isz + 4 + 4) + hc * 4 * 2
    tb = _pick_block(t, max(8, (budget - wbytes) // max(1, row_bytes)))
    n_hc = hdim // hc

    kernel = functools.partial(_ln_mlp_kernel, eps=float(eps), n_hc=n_hc)
    const = lambda i, j: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(t // tb, n_hc),
        in_specs=[
            pl.BlockSpec((tb, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hc, c), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, c), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, c), cdt),
        scratch_shapes=[pltpu.VMEM((tb, c), jnp.float32)],
        interpret=interpret,
    )(x2, ln_scale.astype(jnp.float32).reshape(1, c),
      ln_bias.astype(jnp.float32).reshape(1, c),
      w1.astype(cdt), b1.astype(jnp.float32).reshape(1, hdim),
      w2.astype(cdt), b2.astype(jnp.float32).reshape(1, c))
    return out.reshape(*lead, c)
