"""Fused per-image percentile normalisation (TPU Pallas kernel).

`adaptive_normalize(method="percentile")` is the hot tail of the serving
preprocess path (reference: src/data/quality_preprocessing.py:282-339
AdaptiveNormalization): two value-space bisection quantiles + clip + scale.
As XLA ops the bisection re-reads the whole batch from HBM every iteration
— 2 quantiles × (1 min/max + 22 compare+reduce passes) + the final
clip/scale ≈ 48 full passes over the (B, 224², C) tensor. The round-2
profile attributed ~2.7 ms/iter of the headline bench program to exactly
this loop (convert_reduce_fusion.55 + while.52 in the trace — see
docs/DESIGN.md).

This kernel keeps each image VMEM-resident: ONE HBM read + ONE write, with
the whole double-bisection (both quantiles advanced in the same pass) and
the clip/scale epilogue running on the VPU over on-chip data. The search is
the *same algorithm* as `per_image_quantile_fast` (same bracket update,
same `count(x ≤ mid)` vs `q·(N−1)` test, f32 counts — exact for N < 2²⁴),
so results match the XLA path bit-for-bit up to the final clip/scale
arithmetic.

Layout: images flattened to (B, N) — B on sublanes, N on lanes — so the
per-image reductions are lane-axis tree reductions and the per-image
scalars live in (bb, 1) columns that broadcast back over the row.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tpu_platform import is_tpu


def _bisect_normalize_kernel(x_ref, o_ref, *, q_lo: float, q_hi: float,
                             iters: int, eps: float):
    x = x_ref[:].astype(jnp.float32)              # (bb, N)
    n = x.shape[1]
    t_lo = jnp.float32(q_lo * (n - 1))
    t_hi = jnp.float32(q_hi * (n - 1))
    mn = x.min(axis=1, keepdims=True)             # (bb, 1)
    mx = x.max(axis=1, keepdims=True)

    def body(_, carry):
        lo1, hi1, lo2, hi2 = carry
        mid1 = (lo1 + hi1) * 0.5
        mid2 = (lo2 + hi2) * 0.5
        cnt1 = jnp.sum((x <= mid1).astype(jnp.float32), axis=1,
                       keepdims=True)
        cnt2 = jnp.sum((x <= mid2).astype(jnp.float32), axis=1,
                       keepdims=True)
        up1 = cnt1 <= t_lo
        up2 = cnt2 <= t_hi
        return (jnp.where(up1, mid1, lo1), jnp.where(up1, hi1, mid1),
                jnp.where(up2, mid2, lo2), jnp.where(up2, hi2, mid2))

    lo1, hi1, lo2, hi2 = jax.lax.fori_loop(
        0, iters, body, (mn, mx, mn, mx))
    p_lo = (lo1 + hi1) * 0.5
    p_hi = (lo2 + hi2) * 0.5
    y = jnp.clip(x, p_lo, p_hi)
    o_ref[:] = ((y - p_lo) / (p_hi - p_lo + eps)).astype(o_ref.dtype)


def _stats_quantile_kernel(x_ref, o_ref, *, q: float, iters: int, n: int):
    """Per-image scalars in ONE HBM pass: mean, std, max, min and the
    value-space bisection quantile (same brackets as
    `per_image_quantile_fast` — min/max and the 0/1 counts are
    order-independent exact, so the quantile is BIT-identical to the XLA
    path; mean/std differ only by reduce-order ULPs).

    x_ref: (1, S, 128) — one image, pixels tiled over (sublanes, lanes);
    o_ref: (1, 1, 8) → [mean, std, max, min, quantile, 0, 0, 0].
    """
    x = x_ref[0].astype(jnp.float32)                # (S, 128)
    mn = x.min()
    mx = x.max()
    mean = x.sum() / n
    var = jnp.square(x - mean).sum() / n
    target = jnp.float32(q * (n - 1))

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) * 0.5
        cnt = (x <= mid).astype(jnp.float32).sum()
        go_up = cnt <= target
        return (jnp.where(go_up, mid, lo), jnp.where(go_up, hi, mid))

    lo, hi = jax.lax.fori_loop(0, iters, body, (mn, mx))
    qv = (lo + hi) * 0.5
    o_ref[0, 0] = jnp.stack(
        [mean, jnp.sqrt(var), mx, mn, qv,
         jnp.float32(0), jnp.float32(0), jnp.float32(0)])


def fused_stats_quantile(
    x: jnp.ndarray,
    q: float,
    iters: int = 22,
    interpret: bool | None = None,
) -> dict[str, jnp.ndarray]:
    """Per-image mean/std/max/min + one bisection quantile, fused.

    The quality pipeline's issue masks (`quality_stats`) and artifact
    percentile (`per_image_quantile_fast`) each re-read the full-resolution
    batch from HBM — ~2 + 22 passes at 512². This kernel keeps each image
    VMEM-resident (1 MB at 512² f32) and produces all five scalars in one
    read. x: (B, H, W, C) → dict of (B,) arrays (quantile also under
    "quantile"). Falls back to the XLA formulations off-TPU or when the
    pixel count isn't lane-divisible.
    """
    from .image import per_image_quantile_fast, quality_stats

    b = x.shape[0]
    n = 1
    for d in x.shape[1:]:
        n *= int(d)
    if interpret is None:
        interpret = not is_tpu()
    # fallback: exact same public semantics via the XLA paths. Size guard:
    # per-image block ≤ 4 MB so the double-buffered pipeline stays well
    # under the ~16 MB VMEM (512² f32 images are 1 MB).
    if n % 128 or n * 4 > 4 * 1024 * 1024:
        stats = quality_stats(x)
        stats["quantile"] = per_image_quantile_fast(x, q, iters).reshape(b)
        return stats

    tiled = x.reshape(b, n // 128, 128)
    kernel = functools.partial(_stats_quantile_kernel, q=float(q),
                               iters=int(iters), n=n)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n // 128, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            allow_input_fusion=(True,)),
        interpret=interpret,
    )(tiled)
    out = out[:, 0]
    return {"mean": out[:, 0], "std": out[:, 1], "max": out[:, 2],
            "min": out[:, 3], "quantile": out[:, 4]}


def fused_percentile_normalize(
    x: jnp.ndarray,
    percentiles: tuple[float, float] = (1.0, 99.0),
    iters: int = 22,
    eps: float = 1e-8,
    block_images: int = 8,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Per-image percentile normalisation to [0,1] in one kernel.

    x: (B, H, W, C) → same shape/dtype; numerics match
    `adaptive_normalize(x, "percentile", percentiles)` (same bisection
    brackets; the clip/scale differs only by fusion-level f32 rounding).
    """
    if interpret is None:
        interpret = not is_tpu()
    b = x.shape[0]
    n = 1
    for d in x.shape[1:]:
        n *= int(d)
    flat = x.reshape(b, n)

    bb = min(block_images, b)
    bp = b
    if b % bb or (bb % 8 and bb != b):
        bb = min(8, block_images)
        bp = (b + bb - 1) // bb * bb
        flat = jnp.pad(flat, ((0, bp - b), (0, 0)))

    kernel = functools.partial(
        _bisect_normalize_kernel, q_lo=percentiles[0] / 100.0,
        q_hi=percentiles[1] / 100.0, iters=int(iters), eps=float(eps))
    out = pl.pallas_call(
        kernel,
        grid=(bp // bb,),
        in_specs=[pl.BlockSpec((bb, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bb, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, n), x.dtype),
        # each grid step owns a disjoint image block (parallel); the
        # producer (the resize's convert / the batch pad) may fuse into
        # the input DMA
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            allow_input_fusion=(True,)),
        interpret=interpret,
    )(flat)
    if bp != b:
        out = out[:b]
    return out.reshape(x.shape)
