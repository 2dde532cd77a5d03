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
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tpu_platform import is_tpu

NEG_INF = -1e9


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fwd_compiler_params(n_grid_dims: int, fuse_inputs: tuple) -> "pltpu.CompilerParams":
    """Shared Mosaic params for the FORWARD kernels: every grid dimension
    writes disjoint output blocks and carries no cross-step state, so the
    grid is declared `parallel` (lets Mosaic reorder/pipeline steps freely).
    `fuse_inputs` marks the big streaming operands whose blocks are visited
    once — XLA may fuse their producers (roll / pad / relayout copies)
    straight into the kernel's input DMA instead of materializing them in
    HBM. Weights/biases/masks stay unfused (their blocks are re-read every
    step; a fused producer would be recomputed each time). Backward kernels
    are NOT eligible: they accumulate dbias across grid steps and need the
    default sequential semantics."""
    return pltpu.CompilerParams(
        dimension_semantics=("parallel",) * n_grid_dims,
        allow_input_fusion=fuse_inputs,
    )


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
        # compiled Mosaic kernels need a TPU; elsewhere run interpreted
        interpret = not is_tpu()
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
        compiler_params=_fwd_compiler_params(
            1, (True, True, True, False, True)),
        interpret=interpret,
    )(qp, kp, vp, biasp, m)
    return out[:, :, :n, :d]


# ---------------------------------------------------------------------------
# Fused spatial Swin attention (round 2) — window partition + W-MSA +
# window reverse in ONE kernel, head-packed onto full 128-lane tiles.
#
# Motivation (docs/DESIGN.md round-1 finding): at head_dim 32 a per-head
# layout wastes 3/4 of every VMEM lane tile, and the XLA path spends most of
# its time on HBM round-trips for partition/reshape/moveaxis transposes.
#
# Head packing: P = 128//dh heads live side-by-side in one 128-lane group.
#   scores  S = Q_packed @ K_maskedᵀ      K_masked = tile_P(K) ⊙ block_mask
#     → S[:, i, p·N+j] = Σ_{lanes∈block p} Q[i]·K_p[j]  (block-diagonal
#       contraction: each column block p is head p's score matrix; the full
#       128-lane contraction keeps the MXU saturated instead of 32/128)
#   softmax: one shared row max over all blocks is exact per block (softmax
#     is shift-invariant per block as long as num & denom share the shift);
#     per-block sums via matmul with a block-indicator, inverse expanded
#     back with its transpose — no lane-splitting reshapes anywhere.
#   output  O = P @ V_masked — the block mask routes each head's probs to
#     its own lane block, so O lands already head-packed for the out-proj.
#
# The window partition/reverse are in-VMEM reshapes on sublane dims; the
# kernel reads the (B, H, W, 3, C) qkv tensor directly (one row of windows
# per grid step), so the XLA graph around it is LN → roll → one big qkv
# matmul → kernel → roll⁻¹ → proj.
# ---------------------------------------------------------------------------


def _packed_groups(num_heads: int, head_dim: int):
    """Split heads into lane groups of at most 128 lanes."""
    per = max(1, 128 // head_dim)
    groups = []
    h0 = 0
    while h0 < num_heads:
        p = min(per, num_heads - h0)
        groups.append((h0, p))
        h0 += p
    return groups


def _packed_attention_core(q, k, v, mask_ref, bias_refs, *, ws: int,
                           nww: int, rows: int, bt: int, num_heads: int,
                           head_dim: int, has_mask: bool):
    """Head-packed W-MSA on window-layout f32 tensors q/k/v (RW, N, C)
    (q pre-scaled) → (RW, N, C). Shared by the qkv-input and the
    LN+QKV-fusing forward kernels."""
    groups = _packed_groups(num_heads, head_dim)
    n = ws * ws
    dt = jnp.float32
    rw = bt * rows * nww
    outs = []
    for (h0, p), bias_ref in zip(groups, bias_refs):
        lo, width = h0 * head_dim, p * head_dim
        qg = q[:, :, lo:lo + width]
        kg = k[:, :, lo:lo + width]
        vg = v[:, :, lo:lo + width]
        # block-diagonal lane mask (P·N, width)
        row_blk = jax.lax.broadcasted_iota(jnp.int32, (p * n, width), 0) // n
        lane_blk = jax.lax.broadcasted_iota(jnp.int32, (p * n, width), 1) \
            // head_dim
        blk = (row_blk == lane_blk).astype(dt)
        k_masked = jnp.concatenate([kg] * p, axis=1) * blk[None]
        v_masked = jnp.concatenate([vg] * p, axis=1) * blk[None]

        s = jax.lax.dot_general(                       # (RW, N, P·N) f32
            qg, k_masked, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s = s + bias_ref[:][None]                      # packed (N, P·N)
        if has_mask:
            m = mask_ref[0].astype(jnp.float32)        # (R·nWw, N, N)
            if bt > 1:
                m = jnp.concatenate([m] * bt, axis=0)
            s = s + jnp.concatenate([m] * p, axis=2)
        mrow = s.max(axis=-1, keepdims=True)           # shared shift — exact
        e = jnp.exp(s - mrow)
        # per-block softmax denominators: sum each N-column block, then
        # broadcast back — lane ops only, no lane-splitting reshapes.
        # (A block-diagonal-ones MATMUL computing denom in one MXU op was
        # benchmarked and is NOT faster — 3.01k vs 3.11k img/s swin_tiny:
        # the (P·N → 256-lane) pad makes the matmul cost what the VPU
        # chain costs.)
        denom_blocks = [
            jnp.broadcast_to(
                e[:, :, i * n:(i + 1) * n].sum(axis=-1, keepdims=True),
                (rw, n, n))
            for i in range(p)]
        denom = jnp.concatenate(denom_blocks, axis=2) if p > 1 \
            else denom_blocks[0]
        probs = (e / denom).astype(dt)
        outs.append(jax.lax.dot_general(               # (RW, N, width)
            probs, v_masked, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


def _window_reverse_store(o, o_ref, *, ws: int, nww: int, rows: int, bt: int,
                          c: int):
    """(BT·RW, N, C) window layout → (BT, R·ws, W, C) spatial, stored."""
    o = o.reshape(bt, rows, nww, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    o_ref[:] = o.reshape(bt, rows * ws, nww * ws, c).astype(o_ref.dtype)


def _swin_kernel(qkv_ref, mask_ref, *rest, ws: int, nww: int,
                 rows: int, bt: int, num_heads: int, head_dim: int,
                 scale: float, has_mask: bool):
    groups = _packed_groups(num_heads, head_dim)
    bias_refs, o_ref = rest[:len(groups)], rest[len(groups)]
    n = ws * ws
    c = num_heads * head_dim
    x = qkv_ref[:]                                   # (BT, R·ws, W, 3, C)
    # f32 in-VMEM compute: bf16 operands were MEASURED SLOWER here (2.5× on
    # stage 1) — the (16,128) bf16 tiling of N=49 sublanes plus f32↔bf16
    # relayouts around the softmax cost more than the MXU rate gain.
    dt = jnp.float32
    rw = bt * rows * nww
    # window partition: (BT, R·ws, W, 3C) → (BT·RW, N, 3, C)
    x = x.reshape(bt, rows, ws, nww, ws, 3, c).astype(dt)
    x = x.transpose(0, 1, 3, 2, 4, 5, 6).reshape(rw, n, 3, c)
    q = x[:, :, 0, :] * jnp.asarray(scale, dt)
    k = x[:, :, 1, :]
    v = x[:, :, 2, :]
    o = _packed_attention_core(q, k, v, mask_ref, bias_refs, ws=ws, nww=nww,
                               rows=rows, bt=bt, num_heads=num_heads,
                               head_dim=head_dim, has_mask=has_mask)
    _window_reverse_store(o, o_ref, ws=ws, nww=nww, rows=rows, bt=bt, c=c)


def _swin_proj_kernel(qkv_ref, xres_ref, wp_ref, bp_ref, mask_ref, *rest,
                      ws: int, nww: int, rows: int, bt: int, num_heads: int,
                      head_dim: int, scale: float, has_mask: bool):
    """_swin_kernel + out-projection + residual epilogue (serving path):
    the attention output never reaches HBM pre-proj — the kernel emits the
    BLOCK's residual stream x + proj(W-MSA(qkv)) directly, eliminating the
    separate proj matmul and residual-add HBM round-trips."""
    groups = _packed_groups(num_heads, head_dim)
    bias_refs, o_ref = rest[:len(groups)], rest[len(groups)]
    n = ws * ws
    c = num_heads * head_dim
    x = qkv_ref[:]                                   # (BT, R·ws, W, 3, C)
    dt = jnp.float32
    rw = bt * rows * nww
    x = x.reshape(bt, rows, ws, nww, ws, 3, c).astype(dt)
    x = x.transpose(0, 1, 3, 2, 4, 5, 6).reshape(rw, n, 3, c)
    q = x[:, :, 0, :] * jnp.asarray(scale, dt)
    k = x[:, :, 1, :]
    v = x[:, :, 2, :]
    o = _packed_attention_core(q, k, v, mask_ref, bias_refs, ws=ws, nww=nww,
                               rows=rows, bt=bt, num_heads=num_heads,
                               head_dim=head_dim, has_mask=has_mask)
    # out-proj on the window-layout tokens; cast to the weight dtype first —
    # same rounding as the XLA Dense. UNROLLED over the leading window-row
    # dim: a single (RW·N, C) matmul would need a (RW, N, C)→(RW·N, C)
    # flatten, which merges a leading dim into the N=49 sublane dim — an
    # unsupported Mosaic shape cast (49 is not tile-aligned). Each 2D
    # (N, C)·(C, C) matmul is tile-legal; proj FLOPs are negligible next to
    # the attention core, so MXU underfill here is irrelevant.
    oc = o.astype(wp_ref.dtype)
    wp = wp_ref[:]
    ys = [jax.lax.dot_general(oc[i], wp, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
          for i in range(rw)]
    y = (ys[0][None] if rw == 1 else jnp.stack(ys, axis=0)) \
        + bp_ref[:][None].astype(dt)
    # window reverse, then the residual add rides the already-loaded block
    y = y.reshape(bt, rows, nww, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(bt, rows * ws, nww * ws, c)
    o_ref[:] = (xres_ref[:].astype(dt) + y).astype(o_ref.dtype)


def _fused_swin_fwd_call(
    qkv: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    window_size: int,
    num_heads: int,
    scale: float,
    rows_per_step: Optional[int] = None,
    interpret: bool = False,
    residual: Optional[jnp.ndarray] = None,
    proj_kernel: Optional[jnp.ndarray] = None,
    proj_bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Raw forward pallas_call (no autodiff) — see fused_swin_attention.
    With residual/proj_kernel given, the proj+residual epilogue variant
    (_swin_proj_kernel) emits x + proj(attn) directly."""
    b, hh, ww_, three, c = qkv.shape
    ws = window_size
    dh = c // num_heads
    n = ws * ws
    nwh, nww = hh // ws, ww_ // ws
    if scale is None:
        scale = dh ** -0.5
    has_proj = proj_kernel is not None

    # fit qkv block + per-group scratch comfortably in VMEM. Tunable for
    # perf probes: bigger blocks → fewer grid steps / larger DMA bursts,
    # at the cost of VMEM pressure (Mosaic errors out if it doesn't fit).
    budget = int(float(os.environ.get("THYROID_ATTN_VMEM_MB", "3"))
                 * 1024 * 1024)
    if has_proj:
        budget -= c * c * jnp.dtype(qkv.dtype).itemsize
    bytes_row = ws * ww_ * 3 * c * qkv.dtype.itemsize \
        + nww * n * (max(1, 128 // dh)) * n * 4 * 3
    if has_proj:
        # xres block + its f32 temporary
        bytes_row += ws * ww_ * c * (qkv.dtype.itemsize + 4)
    if rows_per_step is None:
        rows_per_step = max(1, min(nwh, budget // max(1, bytes_row)))
        while nwh % rows_per_step:
            rows_per_step -= 1
    elif nwh % rows_per_step:
        # a non-divisor would silently leave the trailing window rows of the
        # output buffer unwritten (the grid floor-divides)
        raise ValueError(
            f"rows_per_step={rows_per_step} must divide nwh={nwh}")
    r = rows_per_step
    # small late stages (few windows per image): pack multiple images per
    # grid step so the packed matmuls see enough windows to fill the MXU
    bt = 1
    if r == nwh:
        bt = max(1, min(b, budget // max(1, bytes_row * nwh)))
        while b % bt:
            bt -= 1
    rw = r * nww

    has_mask = mask is not None
    if has_mask:
        # (nW, N, N) → (nWh/R, RW, N, N) blocks by window row
        m = mask.reshape(nwh // r, rw, n, n).astype(jnp.float32)
    else:
        m = jnp.zeros((1, 1, 1, 1), jnp.float32)

    # per-group packed rel-pos bias (N, P·N) — lane-merging reshapes are
    # unsupported inside Mosaic kernels, so pack here in XLA
    groups = _packed_groups(num_heads, dh)
    packed_biases = [
        bias[h0:h0 + p].astype(jnp.float32).transpose(1, 0, 2).reshape(n, p * n)
        for h0, p in groups]

    mask_spec = pl.BlockSpec((1, rw, n, n) if has_mask else (1, 1, 1, 1),
                             (lambda i, j: (j, 0, 0, 0)) if has_mask
                             else (lambda i, j: (0, 0, 0, 0)),
                             memory_space=pltpu.VMEM)
    bias_specs = [
        pl.BlockSpec((n, p * n), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM)
        for _, p in groups
    ]
    qkv_spec = pl.BlockSpec((bt, r * ws, ww_, 3, c),
                            lambda i, j: (i, j, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bt, r * ws, ww_, c), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, hh, ww_, c), qkv.dtype)

    if has_proj:
        kernel = functools.partial(
            _swin_proj_kernel, ws=ws, nww=nww, rows=r, bt=bt,
            num_heads=num_heads, head_dim=dh, scale=scale, has_mask=has_mask)
        bp = (proj_bias if proj_bias is not None
              else jnp.zeros((c,), jnp.float32)) \
            .astype(jnp.float32).reshape(1, c)
        return pl.pallas_call(
            kernel,
            grid=(b // bt, nwh // r),
            in_specs=[
                qkv_spec,
                out_spec,  # xres rides the same block layout as the output
                pl.BlockSpec((c, c), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                mask_spec,
            ] + bias_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=_fwd_compiler_params(
                2, (True, True, False, False, False)
                + (False,) * len(groups)),
            interpret=interpret,
        )(qkv, residual, proj_kernel.astype(qkv.dtype), bp, m,
          *packed_biases)

    kernel = functools.partial(
        _swin_kernel, ws=ws, nww=nww, rows=r, bt=bt, num_heads=num_heads,
        head_dim=dh, scale=scale, has_mask=has_mask)
    return pl.pallas_call(
        kernel,
        grid=(b // bt, nwh // r),
        in_specs=[qkv_spec, mask_spec] + bias_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=_fwd_compiler_params(
            2, (True, False) + (False,) * len(groups)),
        interpret=interpret,
    )(qkv, m, *packed_biases)


# ---------------------------------------------------------------------------
# LN+QKV-fusing forward kernel (round 2, serving path) — one kernel computes
# LayerNorm → QKV projection → window partition → W-MSA → window reverse from
# the RAW residual-stream tensor. Motivation (profiled on v5e, B=64
# swin_tiny): the (B,L,3C)→(B,H,W,3,C) reshape feeding the qkv-input kernel
# is a physical relayout (~0.6 ms per stage-1 block), and the pre-LN +
# qkv-matmul XLA ops around the Pallas boundary inherit hostile layouts.
# Fusing them removes the qkv HBM tensor entirely: the kernel reads x
# (B,H,W,1,C) row-major (a bitcast of the residual stream) and writes the
# attention output in the same layout.
#
# The trailing (1, C) keeps the window-partition splits on leading dims
# (same trick as the backward kernel's dO). LN uses flax's fast-variance
# formula (E[x²]−μ²) for bit-compatibility with the XLA path; the QKV
# matmuls run per lane-group as (RW, N, C)·(C, C) dot_generals in the
# model dtype (weights shipped pre-cast, f32 accumulation).
# ---------------------------------------------------------------------------


def _swin_ln_kernel(x_ref, g_ref, b_ref, wq_ref, wk_ref, wv_ref,
                    bq_ref, bk_ref, bv_ref, mask_ref, *rest, ws: int,
                    nww: int, rows: int, bt: int, num_heads: int,
                    head_dim: int, scale: float, has_mask: bool, eps: float):
    groups = _packed_groups(num_heads, head_dim)
    bias_refs, o_ref = rest[:len(groups)], rest[len(groups)]
    n = ws * ws
    c = num_heads * head_dim
    dt = jnp.float32
    rw = bt * rows * nww
    x = x_ref[:]                                     # (BT, R·ws, W, 1, C)
    x = x.reshape(bt, rows, ws, nww, ws, 1, c)
    x = x.transpose(0, 1, 3, 2, 4, 5, 6).reshape(rw, n, 1, c)
    xw = x[:, :, 0, :].astype(dt)                    # (RW, N, C)
    mu = xw.mean(axis=-1, keepdims=True)
    var = jnp.maximum(0.0, (xw * xw).mean(axis=-1, keepdims=True) - mu * mu)
    xn = (xw - mu) * jax.lax.rsqrt(var + jnp.asarray(eps, dt))
    xn = xn * g_ref[:][None].astype(dt) + b_ref[:][None].astype(dt)
    xn = xn.astype(wq_ref.dtype)   # model compute dtype, like the XLA Dense

    def proj(w_ref, pb_ref):
        y = jax.lax.dot_general(xn, w_ref[:], (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return y + pb_ref[:][None].astype(dt)

    q = proj(wq_ref, bq_ref) * jnp.asarray(scale, dt)
    k = proj(wk_ref, bk_ref)
    v = proj(wv_ref, bv_ref)
    o = _packed_attention_core(q, k, v, mask_ref, bias_refs, ws=ws, nww=nww,
                               rows=rows, bt=bt, num_heads=num_heads,
                               head_dim=head_dim, has_mask=has_mask)
    _window_reverse_store(o, o_ref, ws=ws, nww=nww, rows=rows, bt=bt, c=c)


def fused_swin_ln_attention(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    qkv_kernel: jnp.ndarray,
    qkv_bias: Optional[jnp.ndarray],
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    window_size: int,
    num_heads: int,
    scale: Optional[float] = None,
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Serving fast path: x (B, H, W, C) RAW residual stream (already rolled
    if shifted); ln_scale/ln_bias (C,); qkv_kernel (C, 3C); qkv_bias (3C,) or
    None; bias (h, N, N) rel-pos; mask (nW, N, N) or None.
    → (B, H, W, C) attention output (pre out-proj). No autodiff — the
    training path keeps the qkv-input kernel's custom_vjp."""
    if interpret is None:
        interpret = not is_tpu()
    b, hh, ww_, c = x.shape
    ws = window_size
    dh = c // num_heads
    n = ws * ws
    nwh, nww = hh // ws, ww_ // ws
    if scale is None:
        scale = dh ** -0.5
    cdt = x.dtype
    wq = qkv_kernel[:, :c].astype(cdt)
    wk = qkv_kernel[:, c:2 * c].astype(cdt)
    wv = qkv_kernel[:, 2 * c:].astype(cdt)
    if qkv_bias is None:
        bq = bk = bv = jnp.zeros((1, c), jnp.float32)
    else:
        qb = qkv_bias.astype(jnp.float32)
        bq = qb[:c].reshape(1, c)
        bk = qb[c:2 * c].reshape(1, c)
        bv = qb[2 * c:].reshape(1, c)

    pfac = max(1, 128 // dh)
    budget = 3 * 1024 * 1024
    # x block + xn/q/k/v f32 temporaries + packed-attention scratch
    bytes_row = ws * ww_ * c * x.dtype.itemsize \
        + 4 * nww * n * c * 4 \
        + nww * n * pfac * n * 4 * 3
    wbytes = 3 * c * c * jnp.dtype(cdt).itemsize
    rows = max(1, min(nwh, max(1, (budget - wbytes)) // max(1, bytes_row)))
    while nwh % rows:
        rows -= 1
    bt = 1
    if rows == nwh:
        bt = max(1, min(b, max(1, (budget - wbytes))
                        // max(1, bytes_row * nwh)))
        while b % bt:
            bt -= 1

    has_mask = mask is not None
    if has_mask:
        m = mask.reshape(nwh // rows, rows * nww, n, n).astype(jnp.float32)
    else:
        m = jnp.zeros((1, 1, 1, 1), jnp.float32)
    groups = _packed_groups(num_heads, dh)
    packed_biases = [
        bias[h0:h0 + p].astype(jnp.float32).transpose(1, 0, 2).reshape(n, p * n)
        for h0, p in groups]

    kernel = functools.partial(
        _swin_ln_kernel, ws=ws, nww=nww, rows=rows, bt=bt,
        num_heads=num_heads, head_dim=dh, scale=float(scale),
        has_mask=has_mask, eps=float(eps))
    x5 = x.reshape(b, hh, ww_, 1, c)
    const2 = lambda i, j: (0, 0)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(b // bt, nwh // rows),
        in_specs=[
            pl.BlockSpec((bt, rows * ws, ww_, 1, c),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows * nww, n, n) if has_mask else (1, 1, 1, 1),
                         (lambda i, j: (j, 0, 0, 0)) if has_mask
                         else (lambda i, j: (0, 0, 0, 0)),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((n, p * n), const2, memory_space=pltpu.VMEM)
            for _, p in groups
        ],
        out_specs=pl.BlockSpec((bt, rows * ws, ww_, c),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hh, ww_, c), x.dtype),
        compiler_params=_fwd_compiler_params(
            2, (True,) + (False,) * (9 + len(groups))),
        interpret=interpret,
    )(x5, ln_scale.astype(jnp.float32).reshape(1, c),
      ln_bias.astype(jnp.float32).reshape(1, c),
      wq, wk, wv, bq, bk, bv, m, *packed_biases)


# ---------------------------------------------------------------------------
# Backward kernel (round 2) — makes the fused Swin attention trainable.
#
# Flash-style: residuals are just the kernel INPUTS (qkv, bias, mask); the
# backward kernel recomputes the head-packed softmax in VMEM and produces all
# gradients with the same block-diagonal lane-masking trick as the forward:
#   dV = Pᵀ@dO, dP = dO@Vᵀ, dS = P⊙(dP − rowsumₚ(dP⊙P)),
#   dQ = scale·dS@K, dK = dSᵀ@Q_s, dBias = Σ_windows dS
# dSᵀ@Q is computed as a dot_general contraction over the token axis — no
# sublane↔lane transposes anywhere. dBias accumulates across grid steps into
# a constant-index output block (sequential TPU grid).
# ---------------------------------------------------------------------------


def _swin_bwd_kernel(qkv_ref, do_ref, mask_ref, *rest, ws: int, nww: int,
                     rows: int, bt: int, num_heads: int, head_dim: int,
                     scale: float, has_mask: bool):
    groups = _packed_groups(num_heads, head_dim)
    ng = len(groups)
    bias_refs = rest[:ng]
    dqkv_ref = rest[ng]
    dbias_refs = rest[ng + 1:]
    n = ws * ws
    c = num_heads * head_dim
    dt = jnp.float32
    rw = bt * rows * nww
    x = qkv_ref[:].reshape(bt, rows, ws, nww, ws, 3, c).astype(dt)
    x = x.transpose(0, 1, 3, 2, 4, 5, 6).reshape(rw, n, 3, c)
    # dO arrives as (BT, R·ws, W, 1, C): the trailing (1, C) keeps the
    # window-partition splits on LEADING dims (Mosaic rejects sublane-dim
    # shape casts — same trick the forward gets for free from qkv's (3, C))
    do = do_ref[:].reshape(bt, rows, ws, nww, ws, 1, c).astype(dt)
    do = do.transpose(0, 1, 3, 2, 4, 5, 6).reshape(rw, n, 1, c)[:, :, 0, :]
    q = x[:, :, 0, :] * jnp.asarray(scale, dt)
    k = x[:, :, 1, :]
    v = x[:, :, 2, :]
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    dqs, dks, dvs = [], [], []
    for (h0, p), bias_ref, dbias_ref in zip(groups, bias_refs, dbias_refs):
        lo, width = h0 * head_dim, p * head_dim
        qg = q[:, :, lo:lo + width]
        kg = k[:, :, lo:lo + width]
        vg = v[:, :, lo:lo + width]
        dog = do[:, :, lo:lo + width]
        row_blk = jax.lax.broadcasted_iota(jnp.int32, (p * n, width), 0) // n
        lane_blk = jax.lax.broadcasted_iota(jnp.int32, (p * n, width), 1) \
            // head_dim
        blk = (row_blk == lane_blk).astype(dt)
        k_masked = jnp.concatenate([kg] * p, axis=1) * blk[None]
        v_masked = jnp.concatenate([vg] * p, axis=1) * blk[None]

        # recompute the packed softmax exactly as the forward did
        s = jax.lax.dot_general(qg, k_masked, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s + bias_ref[:][None]
        if has_mask:
            m = mask_ref[0].astype(jnp.float32)
            if bt > 1:
                m = jnp.concatenate([m] * bt, axis=0)
            s = s + jnp.concatenate([m] * p, axis=2)
        mrow = s.max(axis=-1, keepdims=True)
        e = jnp.exp(s - mrow)
        denom_blocks = [
            jnp.broadcast_to(
                e[:, :, i * n:(i + 1) * n].sum(axis=-1, keepdims=True),
                (rw, n, n))
            for i in range(p)]
        denom = jnp.concatenate(denom_blocks, axis=2) if p > 1 \
            else denom_blocks[0]
        probs = e / denom                                   # (RW, N, P·N)

        # dV — rows of block p only see lanes of block p after ⊙blk, so the
        # static slice-sum folds (P·N, W) back to packed (N, W)
        dv_m = jax.lax.dot_general(probs, dog, (((1,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)
        dv_m = dv_m * blk[None]
        dv = dv_m[:, :n]
        for i in range(1, p):
            dv = dv + dv_m[:, i * n:(i + 1) * n]

        # dS = P ⊙ (dP − per-block rowsum(dP ⊙ P))
        dp = jax.lax.dot_general(dog, v_masked, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        t = dp * probs
        r_blocks = [
            jnp.broadcast_to(
                t[:, :, i * n:(i + 1) * n].sum(axis=-1, keepdims=True),
                (rw, n, n))
            for i in range(p)]
        r = jnp.concatenate(r_blocks, axis=2) if p > 1 else r_blocks[0]
        ds = probs * (dp - r)                               # (RW, N, P·N)

        contrib = ds.sum(axis=0).astype(dbias_ref.dtype)    # (N, P·N)

        @pl.when(first)
        def _init():
            dbias_ref[:] = contrib

        @pl.when(jnp.logical_not(first))
        def _acc():
            dbias_ref[:] = dbias_ref[:] + contrib

        dq = jax.lax.dot_general(ds, k_masked, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dqs.append(dq * jnp.asarray(scale, dt))
        # dK = dSᵀ @ Q_s without a transpose: contract over the token axis
        dk_m = jax.lax.dot_general(ds, qg, (((1,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)
        dk_m = dk_m * blk[None]
        dk = dk_m[:, :n]
        for i in range(1, p):
            dk = dk + dk_m[:, i * n:(i + 1) * n]
        dks.append(dk)
        dvs.append(dv)

    cat = (lambda xs: xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=-1))
    # lane-concat [dQ | dK | dV] → (RW, N, 3C): matches the (3, C) reshape
    # order applied in XLA outside; avoids an unsupported new-sublane stack
    dx = jnp.concatenate([cat(dqs), cat(dks), cat(dvs)], axis=-1)
    dx = dx.reshape(bt, rows, nww, ws, ws, 3 * c)
    dx = dx.transpose(0, 1, 3, 2, 4, 5)
    dqkv_ref[:] = dx.reshape(bt, rows * ws, nww * ws, 3 * c) \
        .astype(dqkv_ref.dtype)


def _swin_bwd_call(qkv, do, bias, mask, *, window_size: int, num_heads: int,
                   scale: float, interpret: bool):
    b, hh, ww_, _, c = qkv.shape
    ws = window_size
    dh = c // num_heads
    n = ws * ws
    nwh, nww = hh // ws, ww_ // ws
    pfac = max(1, 128 // dh)
    budget = 3 * 1024 * 1024
    # qkv + dqkv + dO blocks, plus ~6 f32 (RW, N, P·N) temporaries
    bytes_row = ws * ww_ * (3 * c * 2 + c) * qkv.dtype.itemsize \
        + nww * n * pfac * n * 4 * 6
    rows = max(1, min(nwh, budget // max(1, bytes_row)))
    while nwh % rows:
        rows -= 1
    bt = 1
    if rows == nwh:
        bt = max(1, min(b, budget // max(1, bytes_row * nwh)))
        while b % bt:
            bt -= 1

    has_mask = mask is not None
    if has_mask:
        m = mask.reshape(nwh // rows, rows * nww, n, n).astype(jnp.float32)
    else:
        m = jnp.zeros((1, 1, 1, 1), jnp.float32)
    groups = _packed_groups(num_heads, dh)
    packed_biases = [
        bias[h0:h0 + p].astype(jnp.float32).transpose(1, 0, 2).reshape(n, p * n)
        for h0, p in groups]

    kernel = functools.partial(
        _swin_bwd_kernel, ws=ws, nww=nww, rows=rows, bt=bt,
        num_heads=num_heads, head_dim=dh, scale=scale, has_mask=has_mask)
    do4 = do.reshape(b, hh, ww_, 1, c)
    outs = pl.pallas_call(
        kernel,
        grid=(b // bt, nwh // rows),
        in_specs=[
            pl.BlockSpec((bt, rows * ws, ww_, 3, c),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, rows * ws, ww_, 1, c),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows * nww, n, n) if has_mask else (1, 1, 1, 1),
                         (lambda i, j: (j, 0, 0, 0)) if has_mask
                         else (lambda i, j: (0, 0, 0, 0)),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((n, p * n), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
            for _, p in groups
        ],
        out_specs=[
            pl.BlockSpec((bt, rows * ws, ww_, 3 * c),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((n, p * n), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
            for _, p in groups
        ],
        out_shape=[jax.ShapeDtypeStruct((b, hh, ww_, 3 * c), qkv.dtype)] + [
            jax.ShapeDtypeStruct((n, p * n), jnp.float32) for _, p in groups],
        # grid stays SEQUENTIAL (dbias accumulates across steps) but the
        # read-once qkv/dO streams may fuse their producers (the dO reshape
        # relayout, the fwd's roll) into the input DMA
        compiler_params=pltpu.CompilerParams(
            allow_input_fusion=(True, True, False)
            + (False,) * len(groups)),
        interpret=interpret,
    )(qkv, do4, m, *packed_biases)
    dqkv = outs[0].reshape(qkv.shape)
    # unpack per-group (N, P·N) lane blocks back to (h, N, N)
    dbias = jnp.concatenate([
        outs[1 + gi].reshape(n, p, n).transpose(1, 0, 2)
        for gi, (_, p) in enumerate(groups)], axis=0)
    return dqkv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _swin_attn_ad(qkv, bias, mask, window_size, num_heads, scale, interpret):
    return _fused_swin_fwd_call(qkv, bias, mask, window_size=window_size,
                                num_heads=num_heads, scale=scale,
                                interpret=interpret)


def _swin_attn_ad_fwd(qkv, bias, mask, window_size, num_heads, scale,
                      interpret):
    out = _fused_swin_fwd_call(qkv, bias, mask, window_size=window_size,
                               num_heads=num_heads, scale=scale,
                               interpret=interpret)
    return out, (qkv, bias, mask)


def _swin_attn_ad_bwd(window_size, num_heads, scale, interpret, res, g):
    qkv, bias, mask = res
    dqkv, dbias = _swin_bwd_call(
        qkv, g.astype(qkv.dtype), bias, mask, window_size=window_size,
        num_heads=num_heads, scale=scale, interpret=interpret)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dqkv.astype(qkv.dtype), dbias.astype(bias.dtype), dmask


_swin_attn_ad.defvjp(_swin_attn_ad_fwd, _swin_attn_ad_bwd)


def fused_swin_attention(
    qkv: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    window_size: int,
    num_heads: int,
    scale: Optional[float] = None,
    rows_per_step: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """qkv: (B, H, W, 3, C) spatial tensor (already LN'd, rolled if shifted,
    and projected); bias: (h, N, N); mask: (nW, N, N) shift mask or None.
    → (B, H, W, C) attention output, windows already reversed.

    Differentiable: a custom_vjp pairs the forward kernel with a flash-style
    backward kernel (residuals = inputs, softmax recomputed in VMEM), so the
    Pallas path serves TRAINING as well as eval. Passing an explicit
    rows_per_step selects the raw forward-only call (kernel tiling tests)."""
    if interpret is None:
        interpret = not is_tpu()
    if scale is None:
        scale = (qkv.shape[-1] // num_heads) ** -0.5
    if rows_per_step is not None:
        return _fused_swin_fwd_call(
            qkv, bias, mask, window_size=window_size, num_heads=num_heads,
            scale=scale, rows_per_step=rows_per_step, interpret=interpret)
    return _swin_attn_ad(qkv, bias, mask, window_size, num_heads,
                         float(scale), bool(interpret))


def fused_swin_block_attention(
    qkv: jnp.ndarray,
    residual: jnp.ndarray,
    proj_kernel: jnp.ndarray,
    proj_bias: Optional[jnp.ndarray],
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    window_size: int,
    num_heads: int,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Serving fast path (forward-only): the full attention half-block —
    W-MSA + out-projection + residual — in one kernel.

        out = residual + proj(window_reverse(W-MSA(partition(qkv))))

    qkv: (B, H, W, 3, C) (already LN'd + projected, rolled if shifted);
    residual: (B, H, W, C) — the pre-LN stream in the SAME (rolled) frame,
    so the caller's roll⁻¹ applies to the summed stream (roll commutes with
    the pointwise add); proj_kernel (C, C), proj_bias (C,) or None.
    → (B, H, W, C) residual stream after the attention half-block.

    vs fused_swin_attention + XLA proj + add: the pre-proj attention tensor,
    the proj output, and both residual-add operands never make an HBM round
    trip. No autodiff — training uses fused_swin_attention's custom_vjp."""
    if interpret is None:
        interpret = not is_tpu()
    if scale is None:
        scale = (qkv.shape[-1] // num_heads) ** -0.5
    return _fused_swin_fwd_call(
        qkv, bias, mask, window_size=window_size, num_heads=num_heads,
        scale=float(scale), interpret=bool(interpret), residual=residual,
        proj_kernel=proj_kernel, proj_bias=proj_bias)


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
