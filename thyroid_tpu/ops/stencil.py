"""Fused median+bilateral artifact-filter stencil (TPU Pallas kernel).

The artifact-suppression chain (ops/image.py suppress_artifacts, reference:
src/data/quality_preprocessing.py:149-170) runs a 3×3 median then a 5×5
bilateral. As XLA ops both are HBM-bound at 512²:

* the median's 19-comparator network executes as ~19 full-resolution
  min/max passes over (B, 512, 512) arrays;
* the bilateral's shifted-stack formulation MATERIALISES the (B, H, W, 25)
  tap stack — 840 MB per 32-image chunk — and streams it back through the
  exp/multiply/reduce fusion (confirmed in the compiled HLO: the reduce
  fusion's operand is the materialised f32[32,512,512,1,25]).

This kernel keeps ONE whole image VMEM-resident per grid step (1 MB at
512² f32) and computes both filters on-chip: one HBM read of the 8-bit
frame, two writes (median and bilateral outputs). Tap math mirrors
ops/image.py exactly — same comparator network, same reflect-101/edge
padding, same circular-window tap set (the 12 taps cv2 skips at d=5 are
skipped at Python level instead of zero-weighted — exact, since x + 0 ≡ x
in f32). The median is bit-identical to the XLA path (same comparator
sequence); the bilateral differs only by summation order in the tap
accumulation (sequential here vs XLA's reduce tree) — sub-ULP-per-tap,
verified ≤1e-2 grey level against the XLA path in tests.
"""
from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tpu_platform import is_tpu

# Paeth's 19-comparator median-of-9 exchange network — the same sequence
# ops/image.py median_filter_3x3 uses (exactly selects the 5th order stat).
_MEDIAN9_NET = [(1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7),
                (1, 2), (4, 5), (7, 8), (0, 3), (5, 8), (4, 7),
                (3, 6), (1, 4), (2, 5), (4, 7), (4, 2), (6, 4),
                (4, 2)]


def median9(p: List[jnp.ndarray]) -> jnp.ndarray:
    """Median of 9 equal-shape arrays via the exchange network."""
    p = list(p)
    for i, j in _MEDIAN9_NET:
        a, b = p[i], p[j]
        p[i] = jnp.minimum(a, b)
        p[j] = jnp.maximum(a, b)
    return p[4]


def _pad_edge(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Edge-replication pad by r on both 2-D axes (cv2 BORDER_REPLICATE)."""
    rows = [x[:1]] * r + [x] + [x[-1:]] * r
    x = jnp.concatenate(rows, axis=0)
    cols = [x[:, :1]] * r + [x] + [x[:, -1:]] * r
    return jnp.concatenate(cols, axis=1)


def _pad_reflect101(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Reflect-101 pad by r on both 2-D axes (cv2 BORDER_REFLECT_101:
    edge row not repeated — top pad rows are x[r], …, x[1])."""
    rows = [x[i:i + 1] for i in range(r, 0, -1)] + [x] + \
        [x[-1 - i:-i or None] for i in range(1, r + 1)]
    x = jnp.concatenate(rows, axis=0)
    cols = [x[:, i:i + 1] for i in range(r, 0, -1)] + [x] + \
        [x[:, -1 - i:-i or None] for i in range(1, r + 1)]
    return jnp.concatenate(cols, axis=1)


def _median_bilateral_kernel(x_ref, med_ref, bil_ref, *, d: int,
                             sigma_color: float, sigma_space: float):
    x = x_ref[0].astype(jnp.float32)                      # (H, W)
    h, w = x.shape

    # 3×3 median, edge replication
    xp = _pad_edge(x, 1)
    med = median9([xp[dy:dy + h, dx:dx + w]
                   for dy in range(3) for dx in range(3)])
    med_ref[0] = med.astype(med_ref.dtype)

    # d×d bilateral on the median, reflect-101, circular window
    r = d // 2
    mp = _pad_reflect101(med, r)
    inv2sc = 1.0 / (2.0 * sigma_color ** 2)
    acc = jnp.zeros_like(med)
    norm = jnp.zeros_like(med)
    for dy in range(d):
        for dx in range(d):
            r2 = float((dy - r) ** 2 + (dx - r) ** 2)
            if np.sqrt(r2) > r:           # cv2's circular-window skip
                continue
            sw = float(np.exp(-r2 / (2.0 * sigma_space ** 2)))
            tap = mp[dy:dy + h, dx:dx + w]
            cw = jnp.exp(-jnp.square(tap - med) * inv2sc) * sw
            acc = acc + tap * cw
            norm = norm + cw
    bil_ref[0] = (acc / norm).astype(bil_ref.dtype)


def fused_median_bilateral(
    x8: jnp.ndarray,
    d: int = 5,
    sigma_color: float = 50.0,
    sigma_space: float = 50.0,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """3×3 median + d×d bilateral of the median, fused on-chip.

    x8: (B, H, W, 1) float on the 8-bit scale → (median, bilateral), both
    (B, H, W, 1), numerically identical to
    `median_filter_3x3` / `bilateral_filter(median)` (ops/image.py).
    """
    if interpret is None:
        interpret = not is_tpu()
    b, h, w, c = x8.shape
    if c != 1:
        raise ValueError(f"stencil kernel is single-channel, got C={c}")
    img = x8[..., 0]
    kernel = partial(_median_bilateral_kernel, d=int(d),
                     sigma_color=float(sigma_color),
                     sigma_space=float(sigma_space))
    med, bil = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((b, h, w), x8.dtype),
                   jax.ShapeDtypeStruct((b, h, w), x8.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # NO allow_input_fusion here: wrapping the call in a kCustom
            # fusion makes XLA re-impose the default 16 MB scoped-vmem
            # limit instead of this kernel's override (observed round 3)
            # whole-image blocks + ~9 live median taps exceed the default
            # 16 MB scoped-vmem budget at 512²; the physical VMEM is larger
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(img)
    return med[..., None], bil[..., None]


def stencil_kernel_ok(h: int, w: int, c: int) -> bool:
    """Whole-image blocks must fit VMEM (~16 MB): in + 2 out + padded
    temporaries ≈ 6 images ≤ 8 MB budget."""
    return c == 1 and h * w * 4 * 6 <= 8 * 1024 * 1024
