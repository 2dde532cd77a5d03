"""Fused, branchless quality-aware preprocessing pipeline (on device).

TPU-native rebuild of the reference's per-image CPU pipeline
(reference: src/data/quality_preprocessing.py — QualityAwarePreprocessor
.preprocess_image:194-228, .validate_preprocessing:172-192, parameter table
:38-56). The reference branches in Python per image; here every branch is
computed batched and selected with per-image masks (`jnp.where`), so the whole
pipeline is one XLA program:

    artifacts?      → percentile-clip + median + (bilateral if still bright)
    extreme dark?   → gamma 0.8, then CLAHE(clip=2.0, grid 16×16)
    elif low contrast? → CLAHE(clip=0.03, grid 32×32)
    guard           → blend back if mean shifted >10× or <0.1×

Input/output are float32 NHWC on the uint16 value scale [0, 65535].
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .clahe import clahe_uint16, clahe_uint16_dual
from .image import (
    adaptive_normalize,
    gamma_correct,
    quality_issue_masks,
    suppress_artifacts,
)


class QualityParams(NamedTuple):
    """Parameter table — values mirror the reference's research-recommended
    settings (reference: src/data/quality_preprocessing.py:38-56)."""

    extreme_dark_gamma: float = 0.8
    extreme_dark_clip: float = 2.0
    extreme_dark_grid: tuple[int, int] = (16, 16)
    low_contrast_clip: float = 0.03
    low_contrast_grid: tuple[int, int] = (32, 32)
    artifact_percentile: float = 99.9
    extreme_dark_threshold: float = 150.0
    low_contrast_threshold: float = 80.0
    artifact_ratio_threshold: float = 30.0


def _per_image_mean(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape(x.shape[0], -1).mean(axis=1).reshape(-1, 1, 1, 1)


@partial(jax.jit, static_argnames=("params", "merged"))
def quality_preprocess(x: jnp.ndarray, params: QualityParams = QualityParams(),
                       merged: bool | None = None) -> jnp.ndarray:
    """Batched quality-aware preprocessing. x: (B,H,W,1) uint16-scale float.

    merged: fuse the two CLAHE branches into ONE histogram pass + ONE
    uint16 round-trip (`clahe_uint16_dual`) — per-image bit-identical to
    the two-pass formulation because the dark/low-contrast branches are
    exclusive. Auto-on when the parameter table's grids nest (the
    reference's (16,16)/(32,32) do).
    """
    # ONE fused pass for every per-image scalar the branch logic needs:
    # mean/std/max (issue masks) + the 99.9-percentile clip value — instead
    # of ~24 separate full-resolution HBM passes (ops/percentile.py).
    from .percentile import fused_stats_quantile

    stats = fused_stats_quantile(x, q=params.artifact_percentile / 100.0)
    masks = quality_issue_masks(
        x,
        extreme_dark_threshold=params.extreme_dark_threshold,
        low_contrast_threshold=params.low_contrast_threshold,
        artifact_ratio_threshold=params.artifact_ratio_threshold,
        stats=stats,
    )
    m_art = masks["artifacts"].reshape(-1, 1, 1, 1)
    m_dark = masks["extreme_dark"].reshape(-1, 1, 1, 1)
    m_lc = masks["low_contrast"].reshape(-1, 1, 1, 1)

    # 1) artifacts first (reference order: preprocess_image:199-205)
    art = suppress_artifacts(x, percentile=params.artifact_percentile,
                             p_high=stats["quantile"].reshape(-1, 1, 1, 1))
    processed = jnp.where(m_art, art, x)

    if merged is None:
        from .clahe import _auto_method

        gc, gf = params.extreme_dark_grid, params.low_contrast_grid
        h, w = x.shape[1], x.shape[2]
        # merged needs (a) nesting grids and (b) both branches auto-picking
        # the SAME apply method as their standalone clahe_8bit calls would
        # (the dual path runs one method for both) — otherwise e.g. an odd
        # fine tile with an even coarse tile would demote the coarse branch
        # from pallas to gather and break bit-identity with the classic path.
        merged = (
            gf == (2 * gc[0], 2 * gc[1])
            and h % gf[0] == 0 and w % gf[1] == 0
            and _auto_method(h // gf[0], w // gf[1])
            == _auto_method(h // gc[0], w // gc[1]))
    if merged:
        # 2+3) one dual-grid CLAHE: per-image input select (dark images see
        # the gamma-corrected frame), one histogram pass, one round-trip.
        # NOTE: `clahe_uint16_dual_fused` (round-trip epilogue + this
        # where() folded into the apply kernel) measured 3070 vs 3097 img/s
        # (−0.9%, twice) — the tail passes already hide under the
        # compute-bound hist/apply kernels and the kernel's extra
        # pass-through input stream costs more than the saved writes, so
        # the composition below stays the default (docs/DESIGN.md).
        clahe_in = jnp.where(
            m_dark, gamma_correct(processed, params.extreme_dark_gamma),
            processed)
        eq = clahe_uint16_dual(
            clahe_in, masks["extreme_dark"],
            clip_coarse=params.extreme_dark_clip,
            grid_coarse=params.extreme_dark_grid,
            clip_fine=params.low_contrast_clip,
            grid_fine=params.low_contrast_grid)
        processed = jnp.where(m_dark | m_lc, eq, processed)
    else:
        # 2) extreme dark: gamma → CLAHE(2.0, 16×16)
        dark = gamma_correct(processed, params.extreme_dark_gamma)
        dark = clahe_uint16(dark, clip_limit=params.extreme_dark_clip,
                            grid=params.extreme_dark_grid)
        # 3) elif low contrast: CLAHE(0.03, 32×32)
        lc = clahe_uint16(processed, clip_limit=params.low_contrast_clip,
                          grid=params.low_contrast_grid)
        processed = jnp.where(m_dark, dark, jnp.where(m_lc, lc, processed))

    # 4) over-correction guard (reference: validate_preprocessing:172-192)
    orig_mean = stats["mean"].reshape(-1, 1, 1, 1)
    proc_mean = _per_image_mean(processed)
    too_bright = proc_mean > orig_mean * 10.0
    too_dark = proc_mean < orig_mean * 0.1
    blended_bright = jnp.floor(x * 0.5 + processed * 0.5)
    blended_dark = jnp.floor(x * 0.7 + processed * 0.3)
    processed = jnp.where(too_bright, blended_bright,
                          jnp.where(too_dark, blended_dark, processed))
    return processed


@partial(jax.jit, static_argnames=("params", "normalize_method"))
def quality_preprocess_and_normalize(
    x: jnp.ndarray,
    params: QualityParams = QualityParams(),
    normalize_method: str = "percentile",
) -> jnp.ndarray:
    """Full transform chain: quality preprocess → adaptive per-image
    percentile normalisation to [0,1] (reference:
    create_quality_aware_transform — src/data/quality_preprocessing.py:342-393)."""
    out = quality_preprocess(x, params)
    return adaptive_normalize(out, method=normalize_method, percentiles=(1.0, 99.0))
