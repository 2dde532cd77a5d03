"""Token-major fused Pallas kernels (TPU serving path).

Profiling swin_tiny on v5e (docs/DESIGN.md round 2) showed the W-MSA Pallas
kernel leaves two XLA cost centres around it: the pre-norm LayerNorms
(XLA lowers them as multi-output convert+reduce fusions in a token-lane
layout, ~1.3 ms each on the stage-1 (64,3136,96) tensor) and the MLP whose
4C-wide hidden tensor makes an HBM round-trip. Both are token-pointwise, so
they fuse cleanly in TOKEN-2D form — x viewed as (B·L, C), a bitcast of the
residual stream — where Mosaic sees plain (tokens, C) @ (C, out) matmuls
with no window structure, no sublane reshapes, and MXU-friendly M.

Kernels:
- fused_ln_matmul:        y = LN(x) @ W + b          (norm1 + QKV proj)
- fused_ln_mlp_residual:  y = x + fc2(gelu(fc1(LN(x))))   (norm2 + MLP)
- fused_ln_mlp:           y = fc2(gelu(fc1(LN(x))))  (training — DropPath and
                          the residual add stay outside the kernel)

All three are DIFFERENTIABLE (round 2 follow-up): each carries a custom_vjp
whose backward recomputes the LN statistics — and, for the MLP, the 4C
hidden activations — in VMEM flash-style, so neither direction ever
materialises the hidden tensor in HBM. The backward work is split by
output-accumulation axis to respect Mosaic's output-revisit rule:

- dX/dγ/dβ kernel: token blocks OUTER, hidden chunks inner — the dX block
  is written once per token block (at the last hidden chunk) and the tiny
  dγ/dβ rows accumulate into constant-index blocks across the whole grid;
- dW1/db1/dW2 kernel: hidden chunks OUTER, token blocks inner — each
  (C, hc)/(hc, C) weight-grad block is then visited consecutively and
  accumulates across token blocks before Pallas flushes it.

dW/db of the plain LN+matmul (and db2 / the Σdy bias grads) are left to
XLA: they are single matmuls over tensors already in HBM, and XLA fuses the
LN recompute into the dW operand load.

LN uses flax's fast-variance numerics (f32 stats, E[x²]−μ²); matmul
operands are cast to the model compute dtype with f32 accumulation, and
intermediate activations are rounded to the compute dtype between layers to
match the XLA Dense → gelu → Dense chain bit-for-bit at f32.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

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


def _gelu_grad(x):
    """d/dx gelu(x) = Φ(x) + x·φ(x) with the in-kernel erf."""
    phi = jnp.exp(-0.5 * x * x) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
    cdf = 0.5 * (1.0 + _erf(x * (2 ** -0.5)))
    return cdf + x * phi


def _ln_rows(x, g, b, eps):
    """flax LayerNorm numerics on (TB, C) rows, f32 in/out."""
    mu = x.mean(axis=-1, keepdims=True)
    var = jnp.maximum(0.0, (x * x).mean(axis=-1, keepdims=True) - mu * mu)
    mul = jax.lax.rsqrt(var + eps) * g
    return (x - mu) * mul + b


def _ln_stats(x, eps):
    """(x̂, rstd) for the LN backward — same fast-variance numerics."""
    mu = x.mean(axis=-1, keepdims=True)
    var = jnp.maximum(0.0, (x * x).mean(axis=-1, keepdims=True) - mu * mu)
    r = jax.lax.rsqrt(var + eps)
    return (x - mu) * r, r


def _ln_bwd_rows(dxn, xhat, r, g):
    """dX of y=x̂·γ+β given dXn, recomputed x̂ and rstd (f32 rows)."""
    dxh = dxn * g
    m1 = dxh.mean(axis=-1, keepdims=True)
    m2 = (dxh * xhat).mean(axis=-1, keepdims=True)
    return r * (dxh - m1 - xhat * m2)


def _pick_block(total: int, limit: int, multiple: int = 8) -> int:
    """Largest divisor of `total` that is ≤ limit AND a multiple of
    `multiple` (Mosaic requires sublane blocks %8 / lane blocks %128, unless
    the block spans the whole dimension). Falls back to `total` itself —
    always legal — when no such divisor exists (e.g. tiny init shapes)."""
    for blk in range(min(total, max(multiple, limit)), multiple - 1, -1):
        if total % blk == 0 and blk % multiple == 0:
            return blk
    return total


def _pick_block_padded(total: int, limit: int) -> Tuple[int, int]:
    """(block, padded_total) for the token grid dim. Prefers an exact
    divisor (no padding); when the divisor structure is hostile — e.g.
    ViT's 197-token sequences make B·197 have only tiny %8 divisors, so a
    divisor-only choice runs hundreds of micro grid steps — pads the token
    count up to a multiple of a full-sized block instead. The caller
    zero-pads rows and slices the output back; LN/matmul/MLP on zero rows
    are finite, and with allow_input_fusion the pad fuses into the kernel's
    input DMA rather than materializing."""
    tb = _pick_block(total, limit)
    # no padding when the divisor is a decent fraction of the budget, or
    # the whole dim fits in one block. NB the _pick_block fallback returns
    # `total` even when total > limit (legal shape, but over the VMEM
    # budget) — that case MUST fall through to padding or Mosaic OOMs at
    # compile (e.g. vit_base serving bucket B=3: t=591, limit≈138).
    if tb <= max(limit, 8) and (tb >= limit // 2 or tb == total):
        return tb, total
    tb = max(8, limit - limit % 8)
    return tb, (total + tb - 1) // tb * tb


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


def _ln_matmul_fwd_call(x2, g, b, w, wb, *, eps: float, interpret: bool):
    t, c = x2.shape
    out_dim = w.shape[1]
    cdt = x2.dtype

    # big token blocks amortize Mosaic's per-grid-step overhead (~1 µs):
    # at 4 MB the stage-1 MLP ran ~900 steps and the stepping cost rivalled
    # the matmuls; 10 MB halves the step count (VMEM is 16 MB/core)
    budget = 10 * 1024 * 1024
    wbytes = c * out_dim * jnp.dtype(cdt).itemsize
    row_bytes = (c + out_dim) * (jnp.dtype(cdt).itemsize + 4)
    tb, tp = _pick_block_padded(t, max(8, (budget - wbytes)
                                       // max(1, row_bytes)))
    if tp != t:
        x2 = jnp.pad(x2, ((0, tp - t), (0, 0)))

    kernel = functools.partial(_ln_matmul_kernel, eps=float(eps),
                               has_bias=True)
    const = lambda i: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(tp // tb,),
        in_specs=[
            pl.BlockSpec((tb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, out_dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_dim), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, out_dim), cdt),
        # token-block grid is stateless → parallel; x2's producer (the
        # shifted block's roll / layout copy, or the token pad above) may
        # fuse into the input DMA
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            allow_input_fusion=(True, False, False, False, False)),
        interpret=interpret,
    )(x2, g.astype(jnp.float32).reshape(1, c),
      b.astype(jnp.float32).reshape(1, c), w.astype(cdt),
      wb.astype(jnp.float32).reshape(1, out_dim))
    return out[:t] if tp != t else out


def _ln_matmul_bwd_kernel(x_ref, g_ref, w_ref, dy_ref, dx_ref, dg_ref,
                          dbl_ref, *, eps: float):
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)
    xhat, r = _ln_stats(x, eps)
    dy = dy_ref[:]
    # dXn = dY @ Wᵀ without a transpose: contract both over the out axis
    dxn = jax.lax.dot_general(dy, w_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dg_c = (dxn * xhat).sum(axis=0, keepdims=True)
    dbl_c = dxn.sum(axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        dg_ref[:] = dg_c
        dbl_ref[:] = dbl_c

    @pl.when(i > 0)
    def _acc():
        dg_ref[:] = dg_ref[:] + dg_c
        dbl_ref[:] = dbl_ref[:] + dbl_c

    g = g_ref[:].astype(jnp.float32)
    dx_ref[:] = _ln_bwd_rows(dxn, xhat, r, g).astype(dx_ref.dtype)


def _ln_matmul_bwd_call(x2, g, w, dy, *, eps: float, interpret: bool):
    t, c = x2.shape
    out_dim = w.shape[1]
    cdt = x2.dtype
    budget = 8 * 1024 * 1024
    wbytes = c * out_dim * jnp.dtype(cdt).itemsize
    row_bytes = (2 * c + out_dim) * (jnp.dtype(cdt).itemsize + 4)
    tb, tp = _pick_block_padded(t, max(8, (budget - wbytes)
                                       // max(1, row_bytes)))
    if tp != t:
        # zero-pad rows: dy=0 rows contribute nothing to dγ/dβ, dx sliced
        x2 = jnp.pad(x2, ((0, tp - t), (0, 0)))
        dy = jnp.pad(dy, ((0, tp - t), (0, 0)))
    kernel = functools.partial(_ln_matmul_bwd_kernel, eps=float(eps))
    const = lambda i: (0, 0)  # noqa: E731
    outs = pl.pallas_call(
        kernel,
        grid=(tp // tb,),
        in_specs=[
            pl.BlockSpec((tb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, out_dim), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, out_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, c), cdt),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(x2, g.astype(jnp.float32).reshape(1, c), w.astype(cdt), dy)
    if tp != t:
        return outs[0][:t], outs[1], outs[2]
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _ln_matmul_ad(x2, g, b, w, wb, eps, interpret):
    return _ln_matmul_fwd_call(x2, g, b, w, wb, eps=eps, interpret=interpret)


def _ln_matmul_ad_fwd(x2, g, b, w, wb, eps, interpret):
    out = _ln_matmul_fwd_call(x2, g, b, w, wb, eps=eps, interpret=interpret)
    return out, (x2, g, b, w)


def _ln_matmul_ad_bwd(eps, interpret, res, dy):
    x2, g, b, w = res
    cdt = x2.dtype
    dx, dg, dbl = _ln_matmul_bwd_call(x2, g, w, dy.astype(cdt),
                                      eps=eps, interpret=interpret)
    # dW = LN(x)ᵀ @ dY and dwb = ΣdY stay in XLA: one matmul over tensors
    # already in HBM, with the LN recompute fused into the operand load
    xn = _ln_rows(x2.astype(jnp.float32), g.astype(jnp.float32),
                  b.astype(jnp.float32), eps).astype(cdt)
    dw = jax.lax.dot_general(xn, dy.astype(cdt), (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dwb = dy.astype(jnp.float32).sum(axis=0)
    return (dx, dg.reshape(g.shape).astype(g.dtype),
            dbl.reshape(b.shape).astype(b.dtype), dw.astype(w.dtype), dwb)


_ln_matmul_ad.defvjp(_ln_matmul_ad_fwd, _ln_matmul_ad_bwd)


def fused_ln_matmul(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    *,
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """x (..., C) → LN(x) @ w + b with LN fused into the matmul's VMEM pass.
    Leading dims are flattened to tokens (a bitcast) and restored.
    Differentiable (custom_vjp with a Pallas dX/dγ/dβ kernel)."""
    if interpret is None:
        interpret = not is_tpu()
    *lead, c = x.shape
    out_dim = w.shape[1]
    t = 1
    for d in lead:
        t *= d
    wb = b if b is not None else jnp.zeros((out_dim,), jnp.float32)
    out = _ln_matmul_ad(x.reshape(t, c), ln_scale, ln_bias, w, wb,
                        float(eps), bool(interpret))
    return out.reshape(*lead, out_dim)


# ---------------------------------------------------------------------------
# LN + MLP + residual  (norm2 + fc1 + gelu + fc2 + skip)
# ---------------------------------------------------------------------------


def _ln_mlp_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   o_ref, acc_ref, *, eps: float, n_hc: int, residual: bool):
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
        base = b2_ref[:].astype(jnp.float32) + part
        acc_ref[:] = x + base if residual else base

    @pl.when(hc_i > 0)
    def _acc():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(hc_i == n_hc - 1)
    def _out():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _mlp_blocks(t: int, c: int, hdim: int, cdt, budget: int):
    isz = jnp.dtype(cdt).itemsize
    hc = _pick_block(hdim, 512, multiple=128)
    wbytes = (c * hc + hc * c) * isz
    row_bytes = c * (isz + 4 + 4) + hc * 4 * 2
    tb, tp = _pick_block_padded(t, max(8, (budget - wbytes)
                                       // max(1, row_bytes)))
    return hc, tb, tp


def _ln_mlp_fwd_call(x2, g, b, w1, b1, w2, b2, *, residual: bool,
                     eps: float, interpret: bool):
    t, c = x2.shape
    hdim = w1.shape[1]
    cdt = x2.dtype
    hc, tb, tp = _mlp_blocks(t, c, hdim, cdt, 10 * 1024 * 1024)
    n_hc = hdim // hc
    if tp != t:
        x2 = jnp.pad(x2, ((0, tp - t), (0, 0)))

    kernel = functools.partial(_ln_mlp_kernel, eps=float(eps), n_hc=n_hc,
                               residual=residual)
    const = lambda i, j: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(tp // tb, n_hc),
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
        out_shape=jax.ShapeDtypeStruct((tp, c), cdt),
        scratch_shapes=[pltpu.VMEM((tb, c), jnp.float32)],
        # token dim parallel; hidden-chunk dim SEQUENTIAL (the scratch
        # accumulator carries partial fc2 sums across chunks)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            allow_input_fusion=(True,) + (False,) * 6),
        interpret=interpret,
    )(x2, g.astype(jnp.float32).reshape(1, c),
      b.astype(jnp.float32).reshape(1, c),
      w1.astype(cdt), b1.astype(jnp.float32).reshape(1, hdim),
      w2.astype(cdt), b2.astype(jnp.float32).reshape(1, c))
    return out[:t] if tp != t else out


def _mlp_recompute(x_ref, g_ref, b_ref, w1_ref, b1_ref, eps):
    """(x f32, xn cdt, h-rounded f32) for one (token block, hidden chunk):
    the shared flash-style recompute both backward kernels start from."""
    x = x_ref[:].astype(jnp.float32)
    xhat, r = _ln_stats(x, eps)
    xn = (xhat * g_ref[:].astype(jnp.float32)
          + b_ref[:].astype(jnp.float32)).astype(w1_ref.dtype)
    h = jax.lax.dot_general(xn, w1_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    hr = h.astype(w1_ref.dtype).astype(jnp.float32)   # fwd's dtype rounding
    return xhat, r, xn, hr


def _ln_mlp_bwd_dx_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref,
                          dy_ref, dx_ref, dg_ref, dbl_ref, acc_ref, *,
                          eps: float, n_hc: int, residual: bool):
    i, j = pl.program_id(0), pl.program_id(1)
    xhat, r, xn, hr = _mlp_recompute(x_ref, g_ref, b_ref, w1_ref, b1_ref, eps)
    dy = dy_ref[:]
    # dA = dY @ W2ᵀ : contract over C;  dH = dA ⊙ gelu'(h)
    da = jax.lax.dot_general(dy, w2_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dh = (da * _gelu_grad(hr)).astype(w1_ref.dtype)
    # dXn partial for this hidden chunk: dH @ W1ᵀ, contract over hc
    part = jax.lax.dot_general(dh, w1_ref[:], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = part

    @pl.when(j > 0)
    def _acc():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(j == n_hc - 1)
    def _fin():
        dxn = acc_ref[:]
        dg_c = (dxn * xhat).sum(axis=0, keepdims=True)
        dbl_c = dxn.sum(axis=0, keepdims=True)

        @pl.when(i == 0)
        def _g_init():
            dg_ref[:] = dg_c
            dbl_ref[:] = dbl_c

        @pl.when(i > 0)
        def _g_acc():
            dg_ref[:] = dg_ref[:] + dg_c
            dbl_ref[:] = dbl_ref[:] + dbl_c

        dx = _ln_bwd_rows(dxn, xhat, r, g_ref[:].astype(jnp.float32))
        if residual:
            dx = dx + dy.astype(jnp.float32)
        dx_ref[:] = dx.astype(dx_ref.dtype)


def _ln_mlp_bwd_dw_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref,
                          dy_ref, dw1_ref, db1_ref, dw2_ref, *, eps: float):
    # grid is (hidden chunk OUTER, token block inner): each weight-grad
    # block is revisited consecutively across token blocks, never after
    i = pl.program_id(1)
    _, _, xn, hr = _mlp_recompute(x_ref, g_ref, b_ref, w1_ref, b1_ref, eps)
    a = _gelu_exactish(hr).astype(w2_ref.dtype)
    dy = dy_ref[:]
    da = jax.lax.dot_general(dy, w2_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dh = (da * _gelu_grad(hr)).astype(w1_ref.dtype)
    # token-axis contractions — no transposes
    dw1_c = jax.lax.dot_general(xn, dh, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dw2_c = jax.lax.dot_general(a, dy, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    db1_c = dh.astype(jnp.float32).sum(axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        dw1_ref[:] = dw1_c
        db1_ref[:] = db1_c
        dw2_ref[:] = dw2_c

    @pl.when(i > 0)
    def _acc():
        dw1_ref[:] = dw1_ref[:] + dw1_c
        db1_ref[:] = db1_ref[:] + db1_c
        dw2_ref[:] = dw2_ref[:] + dw2_c


def _ln_mlp_bwd_call(x2, g, b, w1, b1, w2, dy, *, residual: bool,
                     eps: float, interpret: bool):
    t, c = x2.shape
    hdim = w1.shape[1]
    cdt = x2.dtype
    hc, tb, tp = _mlp_blocks(t, c, hdim, cdt, 6 * 1024 * 1024)
    n_hc = hdim // hc
    if tp != t:
        # zero-pad rows: dy=0 rows are inert in every accumulated gradient
        x2 = jnp.pad(x2, ((0, tp - t), (0, 0)))
        dy = jnp.pad(dy, ((0, tp - t), (0, 0)))
    const2 = lambda i, j: (0, 0)  # noqa: E731
    args = (x2, g.astype(jnp.float32).reshape(1, c),
            b.astype(jnp.float32).reshape(1, c),
            w1.astype(cdt), b1.astype(jnp.float32).reshape(1, hdim),
            w2.astype(cdt), dy)

    dx_kernel = functools.partial(_ln_mlp_bwd_dx_kernel, eps=float(eps),
                                  n_hc=n_hc, residual=residual)
    in_specs_dx = [
        pl.BlockSpec((tb, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((c, hc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((hc, c), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
    ]
    dx, dg, dbl = pl.pallas_call(
        dx_kernel,
        grid=(tp // tb, n_hc),
        in_specs=in_specs_dx,
        out_specs=[
            pl.BlockSpec((tb, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tp, c), cdt),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tb, c), jnp.float32)],
        interpret=interpret,
    )(*args)
    if tp != t:
        dx = dx[:t]

    dw_kernel = functools.partial(_ln_mlp_bwd_dw_kernel, eps=float(eps))
    in_specs_dw = [
        pl.BlockSpec((tb, c), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((c, hc), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hc), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((hc, c), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, c), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
    ]
    dw1, db1, dw2 = pl.pallas_call(
        dw_kernel,
        grid=(n_hc, tp // tb),
        in_specs=in_specs_dw,
        out_specs=[
            pl.BlockSpec((c, hc), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hc, c), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, hdim), jnp.float32),
            jax.ShapeDtypeStruct((1, hdim), jnp.float32),
            jax.ShapeDtypeStruct((hdim, c), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return dx, dg, dbl, dw1, db1, dw2


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _ln_mlp_ad(x2, g, b, w1, b1, w2, b2, residual, eps, interpret):
    return _ln_mlp_fwd_call(x2, g, b, w1, b1, w2, b2, residual=residual,
                            eps=eps, interpret=interpret)


def _ln_mlp_ad_fwd(x2, g, b, w1, b1, w2, b2, residual, eps, interpret):
    out = _ln_mlp_fwd_call(x2, g, b, w1, b1, w2, b2, residual=residual,
                           eps=eps, interpret=interpret)
    return out, (x2, g, b, w1, b1, w2, b2)


def _ln_mlp_ad_bwd(residual, eps, interpret, res, dy):
    x2, g, b, w1, b1, w2, b2 = res
    b2_dtype = b2.dtype
    dy = dy.astype(x2.dtype)
    dx, dg, dbl, dw1, db1, dw2 = _ln_mlp_bwd_call(
        x2, g, b, w1, b1, w2, dy, residual=residual, eps=eps,
        interpret=interpret)
    db2 = dy.astype(jnp.float32).sum(axis=0)
    return (dx, dg.reshape(g.shape).astype(g.dtype),
            dbl.reshape(b.shape).astype(b.dtype), dw1.astype(w1.dtype),
            db1.reshape(b1.shape).astype(b1.dtype), dw2.astype(w2.dtype),
            db2.astype(b2_dtype))


_ln_mlp_ad.defvjp(_ln_mlp_ad_fwd, _ln_mlp_ad_bwd)


def _ln_mlp_apply(x, ln_scale, ln_bias, w1, b1, w2, b2, residual, eps,
                  interpret):
    if interpret is None:
        interpret = not is_tpu()
    *lead, c = x.shape
    t = 1
    for d in lead:
        t *= d
    out = _ln_mlp_ad(x.reshape(t, c), ln_scale, ln_bias, w1, b1, w2, b2,
                     bool(residual), float(eps), bool(interpret))
    return out.reshape(*lead, c)


def fused_ln_mlp_residual(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """x (..., C) → x + fc2(gelu(fc1(LN(x)))) in one kernel: the 4C-wide
    hidden tensor never leaves VMEM. The hidden dim is chunked over a
    sequential grid axis with an f32 accumulator in scratch; the residual
    read rides the same x block the LN uses. Differentiable."""
    return _ln_mlp_apply(x, ln_scale, ln_bias, w1, b1, w2, b2, True, eps,
                         interpret)


def fused_ln_mlp(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Training variant WITHOUT the residual add: returns the MLP branch
    fc2(gelu(fc1(LN(x)))) so DropPath and the skip stay outside the kernel
    (they are stochastic in training and cheap in XLA). Differentiable."""
    return _ln_mlp_apply(x, ln_scale, ln_bias, w1, b1, w2, b2, False, eps,
                         interpret)
