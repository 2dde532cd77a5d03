"""Sliding-window depthwise convolution as ONE VMEM-resident Pallas kernel.

MEASURED NEGATIVE RESULT (v5e, round 2) — kept opt-in
(`model.dw_pallas_conv: true`), default OFF. bench.py efficientnet_b0
bf16 B=256: 17.97k -> 6.4k img/s (2.8x slower end-to-end) with this
kernel on every stride-1 depthwise stage. Why it loses: depthwise conv on
v5e is VPU-FLOP-bound, not HBM-bound — XLA's `EmitDepthwiseAllBatchInLanes`
emitter measures ~1 GFMA/ms across the 16 stages (~9.2 G tap-FMAs in
~9.3 ms), i.e. ~1 FMA/lane/cycle = the VPU's effective FMA rate, with tap
offsets folded into load ADDRESSING (batch in lanes, spatial on sublanes
— shifts are free). Any channel-packed kernel layout pays a real vector
shift (lane or sublane rotate) per tap plus edge masking, so its op count
per element is ~2-4x the pure-FMA floor that XLA already achieves. The
"several times slower than the HBM roofline" reading in the round-2
profile was the wrong roofline: at k²=9..25 taps over 2-byte elements the
arithmetic intensity puts every one of these stages far into the
compute-bound regime. Don't re-attempt on the VPU; the only paths past
XLA here are a different algorithm (none known that preserves parity) or
int8 (VPU int ops don't run faster on this chip).

EfficientNet's inference profile on v5e is dominated by its 16 depthwise
stages (~9.3 of ~14.6 ms/iter, scripts/profile_bench.py round 2): XLA
lowers them with the `EmitDepthwiseAllBatchInLanes` emitter, and the
XLA-level shift-MAC rewrite (ops/depthwise.py) measured 4x WORSE. This
kernel was the third decomposition tried — it keeps a block of whole
images resident in VMEM and does the whole k² stencil on-chip:

- Layout: NHWC viewed as (B, Hp, (W+2p)·C) — image rows on sublanes,
  channels packed densely into lanes. Every EfficientNet channel count
  (32..1152) gets ~100% lane utilisation, unlike a (W, C) tile layout
  where C=32 wastes 3/4 of every 128-lane vector.
- BOTH spatial pads are materialised by the host-side pad+reshape (fused
  into the kernel's input DMA via `allow_input_fusion`): W into the lane
  axis, H into the sublane axis — rounded up so the sublane dims meet
  Mosaic's tiling constraint. Every tap is then a static (sublane, lane)
  slice: no rolls, no edge masks; rows past H read zeros, produce zeros,
  and are sliced off after the call.
- Per-tap weights arrive pre-tiled to the packed lane layout
  ((k², W·C), weight[tap, w·C+c] = k[dy,dx,c]) so each tap is one
  broadcast FMA. Accumulation is f32 regardless of input dtype (the same
  contract as XLA's bf16 conv), threaded through a VMEM scratch with
  sequential stores — a pure-value formulation kept all k² unrolled
  temporaries live and OOMed scoped VMEM at k=5.

Autodiff: custom_vjp whose backward runs as plain XLA (input grad = the
stencil with a spatially flipped kernel; weight grad = k² shifted
reductions) — analysis paths (Grad-CAM on eval forwards) differentiate
through it without a backward kernel; training keeps XLA's conv anyway.

Reference anchor: the depthwise stages of EfficientNet MBConv blocks
(reference: src/models/cnn/efficientnet.py delegates to timm's
efficientnet_b0..b3 — depthwise_conv2d in every inverted residual).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tpu_platform import is_tpu

# VMEM working-set target per grid step (bytes): input slab (double
# buffered) + one f32 copy + shifted slice + f32 accumulator + output.
_VMEM_BUDGET = 8 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _dw_kernel(xp_ref, wr_ref, o_ref, acc_ref, *, W: int, C: int,
               kh: int, kw: int):
    WC = W * C
    ho = o_ref.shape[1]
    xf = xp_ref[:].astype(jnp.float32)            # (m, Hp, (W+2p)·C)
    for iy in range(kh):
        xs = xf[:, iy:iy + ho, :]
        for ix in range(kw):
            term = (xs[:, :, ix * C:ix * C + WC]
                    * wr_ref[iy * kw + ix:iy * kw + ix + 1, :].reshape(
                        1, 1, WC))
            # sequential in-place accumulation: the store chain pins tap
            # order so Mosaic's stack allocator reuses one term buffer
            if iy == 0 and ix == 0:
                acc_ref[:] = term
            else:
                acc_ref[:] = acc_ref[:] + term
    o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _pick_images_per_block(b: int, hp: int, ho: int, wpc: int, wc: int,
                           in_bytes: int, out_bytes: int) -> int:
    per_img = hp * wpc * (2 * in_bytes + 8) + ho * wc * (8 + 2 * out_bytes)
    m = 1
    for cand in range(2, b + 1):
        if b % cand == 0 and cand * per_img <= _VMEM_BUDGET:
            m = cand
    return m


def _dw_forward(x: jnp.ndarray, w: jnp.ndarray, *,
                block_images: int | None, interpret: bool | None):
    b, h, ww, c = x.shape
    kh, kw = int(w.shape[0]), int(w.shape[1])
    p = kh // 2
    wpc = (ww + 2 * p) * c
    wc = ww * c
    if interpret is None:
        interpret = not is_tpu()

    # sublane dims rounded to Mosaic's block constraint (8); input slab
    # leaves room for the k-1 tap reach past the last output row
    ho = _round_up(h, 8)
    hp = _round_up(ho + 2 * p, 8)
    xp = jnp.pad(x, ((0, 0), (p, hp - h - p), (p, p), (0, 0))).reshape(
        b, hp, wpc)
    wr = jnp.tile(w.reshape(kh * kw, c).astype(jnp.float32), (1, ww))

    m = block_images or _pick_images_per_block(
        b, hp, ho, wpc, wc, x.dtype.itemsize, x.dtype.itemsize)

    kernel = functools.partial(_dw_kernel, W=ww, C=c, kh=kh, kw=kw)
    out = pl.pallas_call(
        kernel,
        grid=(b // m,),
        in_specs=[
            pl.BlockSpec((m, hp, wpc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh * kw, wc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, ho, wc), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wc), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, ho, wc), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            allow_input_fusion=(True, False)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * ww * c * kh * kw,
            bytes_accessed=(b * hp * wpc + b * ho * wc) * x.dtype.itemsize
            + kh * kw * wc * 4,
            transcendentals=0),
        interpret=interpret,
    )(xp, wr)
    return out[:, :h, :].reshape(b, h, ww, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def depthwise_conv2d_pallas(x: jnp.ndarray, w: jnp.ndarray,
                            block_images: int | None = None,
                            interpret: bool | None = None) -> jnp.ndarray:
    """Stride-1 depthwise conv, symmetric k//2 zero padding.

    x: (B, H, W, C); w: (kh, kw, 1, C) — the flax
    `nn.Conv(feature_group_count=C)` kernel layout. Returns (B, H, W, C)
    in x.dtype with f32 accumulation (matches XLA's conv contract up to
    f32 reduction order).
    """
    return _dw_forward(x, w, block_images=block_images, interpret=interpret)


def _dw_fwd(x, w, block_images, interpret):
    return _dw_forward(x, w, block_images=block_images,
                       interpret=interpret), (x, w)


def _dw_bwd(block_images, interpret, res, g):
    x, w = res
    kh, kw = int(w.shape[0]), int(w.shape[1])
    p = kh // 2
    gf = g.astype(jnp.float32)
    # input grad: correlate g with the spatially flipped kernel (stride-1
    # symmetric-pad stencils are self-adjoint up to the flip)
    wf = jnp.flip(jnp.flip(w, 0), 1).astype(jnp.float32)
    dx = jax.lax.conv_general_dilated(
        gf, wf, window_strides=(1, 1), padding=[(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1]).astype(x.dtype)
    # weight grad: per-tap reduction over the shifted input
    xpad = jnp.pad(x.astype(jnp.float32),
                   ((0, 0), (p, p), (p, p), (0, 0)))
    h, ww = x.shape[1], x.shape[2]
    taps = []
    for iy in range(kh):
        row = []
        for ix in range(kw):
            sl = xpad[:, iy:iy + h, ix:ix + ww, :]
            row.append(jnp.sum(sl * gf, axis=(0, 1, 2)))
        taps.append(jnp.stack(row))
    dw = jnp.stack(taps)[:, :, None, :].astype(w.dtype)
    return dx, dw


depthwise_conv2d_pallas.defvjp(_dw_fwd, _dw_bwd)
