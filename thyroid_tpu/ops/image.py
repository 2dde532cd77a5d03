"""Batched, on-device image ops (XLA) — the TPU-native replacement for the
reference's per-image CPU cv2/scipy preprocessing.

Reference behaviors rebuilt here (semantics, not code):
- uint16 coercion + /65535 normalisation (reference: src/data/dataset.py:525-551)
- gamma correction on [0,1]^γ in uint16 space (src/data/quality_preprocessing.py:114-123)
- percentile clip + median + conditional bilateral artifact suppression (:149-170)
- per-image adaptive percentile / minmax normalisation (:282-339)
- Anscombe variance-stabilising transform (src/data/transforms.py:24)
- quality-issue detection thresholds (:85-112)

All functions take NHWC float32 batches and are jit/vmap-friendly: no Python
branching on data, everything masked with `jnp.where`.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

UINT16_MAX = 65535.0


# ---------------------------------------------------------------------------
# dtype / scale plumbing
# ---------------------------------------------------------------------------

def to_uint16_scale(x: jnp.ndarray) -> jnp.ndarray:
    """Coerce uint8/uint16/float arrays to float32 on the uint16 value scale.

    uint8 inputs are upscaled ×257 so 255 → 65535, matching the reference's
    coercion chain (reference: src/data/dataset.py:525-529).
    """
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) * 257.0
    return x.astype(jnp.float32)


def normalize_uint16(x: jnp.ndarray) -> jnp.ndarray:
    """uint16-scale → [0,1] (reference: src/data/dataset.py:542)."""
    return x / UINT16_MAX


# ---------------------------------------------------------------------------
# resize
# ---------------------------------------------------------------------------

def _bilinear_weight_matrix(in_size: int, out_size: int) -> jnp.ndarray:
    """Dense (out, in) bilinear sampling matrix with cv2.INTER_LINEAR
    coordinate semantics: src = (dst+0.5)·scale − 0.5, border-clamped with
    zeroed fractional weight (no antialiasing — unlike jax.image.resize)."""
    scale = in_size / out_size
    src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    sx = jnp.floor(src)
    fx = src - sx
    fx = jnp.where(sx < 0, 0.0, fx)
    sx = jnp.maximum(sx, 0)
    # src at/past the last pixel: clamp the PAIR down but move the full
    # weight to the high tap (fx=1 → pixel in−1). Zeroing fx here (the old
    # code) put full weight on pixel in−2 — wrong last row/column for every
    # identity or upscale resize (cv2 clamps to the LAST pixel).
    fx = jnp.where(sx >= in_size - 1, 1.0, fx)
    sx = jnp.minimum(sx, max(in_size - 2, 0)).astype(jnp.int32)
    i1 = jnp.minimum(sx + 1, in_size - 1)
    w0 = jax.nn.one_hot(sx, in_size, dtype=jnp.float32) * (1.0 - fx)[:, None]
    w1 = jax.nn.one_hot(i1, in_size, dtype=jnp.float32) * fx[:, None]
    return w0 + w1


def resize_bilinear(x: jnp.ndarray, size: int | tuple[int, int]) -> jnp.ndarray:
    """Batched bilinear resize as two separable weight-matrix contractions —
    rides the MXU instead of gather units, and matches cv2.INTER_LINEAR
    (the reference's resize — src/data/dataset.py:539) rather than
    jax.image.resize's antialiased downscale.

    x: (B, H, W, C) → (B, h, w, C).
    """
    if isinstance(size, int):
        size = (size, size)
    _, h, w, _ = x.shape
    wh = _bilinear_weight_matrix(h, size[0])
    ww = _bilinear_weight_matrix(w, size[1])
    out = jnp.einsum("oh,bhwc->bowc", wh, x, preferred_element_type=jnp.float32)
    return jnp.einsum("pw,bowc->bopc", ww, out, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# intensity ops
# ---------------------------------------------------------------------------

def gamma_correct(x: jnp.ndarray, gamma: float | jnp.ndarray) -> jnp.ndarray:
    """Gamma on the uint16 scale: (x/65535)^γ · 65535, round-trip through the
    reference's uint16 cast (reference: src/data/quality_preprocessing.py:114-123)."""
    xn = jnp.clip(x / UINT16_MAX, 0.0, 1.0)
    out = jnp.power(xn, gamma) * UINT16_MAX
    return jnp.floor(out)  # uint16 cast truncates


def anscombe(x: jnp.ndarray) -> jnp.ndarray:
    """Anscombe variance-stabilising transform for Poisson noise
    (reference: src/data/transforms.py:24, scripts/preprocess_images.py:32-37)."""
    return 2.0 * jnp.sqrt(x + 3.0 / 8.0)


def inverse_anscombe(y: jnp.ndarray) -> jnp.ndarray:
    return jnp.square(y / 2.0) - 3.0 / 8.0


def per_image_quantile(x: jnp.ndarray, q: float | jnp.ndarray) -> jnp.ndarray:
    """Per-image quantile over H,W,C. x: (B,H,W,C) → (B,1,1,1).

    Exact sort-based quantile (matches np.quantile interpolation). For the
    hot preprocessing path prefer `per_image_quantile_fast` — sorts are the
    slowest primitive on TPU."""
    b = x.shape[0]
    flat = x.reshape(b, -1)
    out = jnp.quantile(flat, jnp.asarray(q), axis=1)
    return out.reshape(b, 1, 1, 1)


def per_image_quantile_fast(
    x: jnp.ndarray, q: float, iters: int = 22
) -> jnp.ndarray:
    """Per-image quantile via value-space bisection — O(iters·N) pure VPU
    compare+reduce passes instead of an O(N log² N) TPU sort.

    Converges the threshold t with count(x ≤ t) ≈ q·(N−1) to a value
    resolution of range/2^iters (< 0.02 on the uint16 scale at 22 iters) —
    well inside the tolerance of the normalisation consumers. x: (B,H,W,C)
    → (B,1,1,1)."""
    b = x.shape[0]
    flat = x.reshape(b, -1)
    n = flat.shape[1]
    target = q * (n - 1)
    lo = flat.min(axis=1)
    hi = flat.max(axis=1)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) * 0.5
        cnt = (flat <= mid[:, None]).sum(axis=1).astype(jnp.float32)
        go_up = cnt <= target
        return jnp.where(go_up, mid, lo), jnp.where(go_up, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return ((lo + hi) * 0.5).reshape(b, 1, 1, 1)


def per_image_quantiles_multiway(
    x: jnp.ndarray,
    qs: tuple[float, ...],
    passes: int = 6,
    k: int = 16,
) -> jnp.ndarray:
    """Per-image quantiles via k-ary value-space search. x: (B,H,W,C) →
    (B, len(qs)).

    MEASURED NEGATIVE on v5e (round 2, /tmp-style A/B at B=256 224²):
    resize+normalize 6.17 ms/iter with k=16×6 passes vs 3.87 ms with the
    plain 2×22-pass binary bisection (4.77 ms at k=8×8). In theory the
    k-ary search reads the batch 7× instead of 45×; in practice XLA lowers
    the (B, Q, k−1, N) broadcast-compare-reduce as materialised
    intermediates rather than one fused pass, and the extra VPU compares
    cost more than the reads they save. `adaptive_normalize` therefore
    stays on `per_image_quantile_fast`; this is kept for the record, for
    many-quantile callers (Q ≫ 2 amortises the pass), and for tests.
    Same bracket semantics as `per_image_quantile_fast` (count(x ≤ t)
    vs q·(N−1)); answer is the bracket midpoint."""
    b = x.shape[0]
    flat = x.reshape(b, 1, 1, -1).astype(jnp.float32)   # (B,1,1,N)
    n = flat.shape[-1]
    nq = len(qs)
    targets = jnp.asarray(qs, jnp.float32) * (n - 1)     # (Q,)
    mn = flat.min(axis=-1)                               # (B,1,1)
    mx = flat.max(axis=-1)
    lo = jnp.broadcast_to(mn, (b, 1, nq)).reshape(b, nq)
    hi = jnp.broadcast_to(mx, (b, 1, nq)).reshape(b, nq)
    frac = jnp.arange(1, k, dtype=jnp.float32) / k       # (k−1,)

    def body(_, carry):
        lo, hi = carry                                   # (B,Q)
        width = hi - lo
        t = lo[..., None] + width[..., None] * frac      # (B,Q,k−1)
        # one fused compare+reduce: (B,Q,k−1,N) virtual, reduced over N
        cnt = (flat <= t[..., None]).sum(axis=-1).astype(jnp.float32)
        # bracket index = #thresholds with cnt ≤ target (cnt nondecreasing)
        le = (cnt <= targets[None, :, None]).sum(axis=-1) \
            .astype(jnp.float32)                         # (B,Q) ∈ [0, k−1]
        step = width / k
        lo2 = lo + le * step
        return lo2, lo2 + step

    lo, hi = jax.lax.fori_loop(0, passes, body, (lo, hi))
    return (lo + hi) * 0.5


def adaptive_normalize(
    x: jnp.ndarray,
    method: str = "percentile",
    percentiles: tuple[float, float] = (1.0, 99.0),
    eps: float = 1e-8,
    use_kernel: bool | None = None,
) -> jnp.ndarray:
    """Per-image normalisation to [0,1] (reference:
    src/data/quality_preprocessing.py:282-339 AdaptiveNormalization).
    Percentiles use the bisection quantile (sort-free hot path); on TPU the
    whole normalisation runs as ONE VMEM-resident Pallas kernel
    (ops/percentile.py) instead of ~48 HBM passes — same bisection
    algorithm, same brackets."""
    if method == "percentile":
        n_px = 1
        for d in x.shape[1:]:
            n_px *= int(d)
        if use_kernel is None:
            # 8-image blocks, double-buffered in/out: stay under VMEM.
            # THYROID_PERCENTILE_KERNEL=0 is the ops-level kill switch.
            import os

            from .tpu_platform import is_tpu

            use_kernel = (
                os.environ.get("THYROID_PERCENTILE_KERNEL", "1") != "0"
                and is_tpu() and n_px * 4 * 8 * 4 <= 12 * 1024 * 1024)
        if use_kernel:
            from .percentile import fused_percentile_normalize

            return fused_percentile_normalize(
                x, percentiles=percentiles, eps=eps)
        p_low = per_image_quantile_fast(x, percentiles[0] / 100.0)
        p_high = per_image_quantile_fast(x, percentiles[1] / 100.0)
        x = jnp.clip(x, p_low, p_high)
        return (x - p_low) / (p_high - p_low + eps)
    if method == "minmax":
        b = x.shape[0]
        flat = x.reshape(b, -1)
        x_min = flat.min(axis=1).reshape(b, 1, 1, 1)
        x_max = flat.max(axis=1).reshape(b, 1, 1, 1)
        return (x - x_min) / (x_max - x_min + eps)
    raise ValueError(f"unknown normalisation method {method!r}")


def standardize(x: jnp.ndarray, mean, std) -> jnp.ndarray:
    """Channelwise (x-mean)/std; mean/std are per-channel sequences."""
    mean = jnp.asarray(mean, dtype=x.dtype).reshape(1, 1, 1, -1)
    std = jnp.asarray(std, dtype=x.dtype).reshape(1, 1, 1, -1)
    return (x - mean) / std


# ---------------------------------------------------------------------------
# quality-issue detection
# ---------------------------------------------------------------------------

def quality_stats(x: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """Per-image mean/std/max over H,W,C. x: (B,H,W,C), uint16 scale."""
    b = x.shape[0]
    flat = x.reshape(b, -1)
    return {
        "mean": flat.mean(axis=1),
        "std": flat.std(axis=1),
        "max": flat.max(axis=1),
        "min": flat.min(axis=1),
    }


def quality_issue_masks(
    x: jnp.ndarray,
    extreme_dark_threshold: float = 150.0,
    low_contrast_threshold: float = 80.0,
    artifact_ratio_threshold: float = 30.0,
    stats: dict[str, jnp.ndarray] | None = None,
) -> dict[str, jnp.ndarray]:
    """Branchless issue detection (reference thresholds:
    src/data/quality_preprocessing.py:85-112 — dark: mean<150;
    low-contrast: elif std<80; artifacts: max/mean>30). Returns (B,) bool
    masks. `stats` lets the hot pipeline pass precomputed per-image
    mean/std/max (ops/percentile.py fused_stats_quantile)."""
    s = stats if stats is not None else quality_stats(x)
    dark = s["mean"] < extreme_dark_threshold
    low_contrast = jnp.logical_and(~dark, s["std"] < low_contrast_threshold)
    ratio = s["max"] / jnp.maximum(s["mean"], 1e-8)
    artifacts = jnp.logical_and(s["mean"] > 0, ratio > artifact_ratio_threshold)
    return {"extreme_dark": dark, "low_contrast": low_contrast, "artifacts": artifacts}


# ---------------------------------------------------------------------------
# spatial filters (shifted-stack formulation — fully vectorised on the VPU)
# ---------------------------------------------------------------------------

def _shifted_stack(x: jnp.ndarray, radius: int,
                   pad_mode: str = "edge") -> jnp.ndarray:
    """All (2r+1)² padded spatial shifts of x, stacked on a new last axis.
    x: (B,H,W,C) → (B,H,W,C,K). pad_mode "edge" = cv2 BORDER_REPLICATE
    (medianBlur); "reflect" = cv2 BORDER_REFLECT_101 (bilateralFilter's
    default border)."""
    k = 2 * radius + 1
    xp = jnp.pad(x, ((0, 0), (radius, radius), (radius, radius), (0, 0)),
                 mode=pad_mode)
    h, w = x.shape[1], x.shape[2]
    shifts = [
        jax.lax.dynamic_slice_in_dim(
            jax.lax.dynamic_slice_in_dim(xp, dy, h, axis=1), dx, w, axis=2
        )
        for dy in range(k)
        for dx in range(k)
    ]
    return jnp.stack(shifts, axis=-1)


def median_filter_3x3(x: jnp.ndarray) -> jnp.ndarray:
    """3×3 median with edge replication (cv2.medianBlur(ksize=3) semantics,
    reference: src/data/quality_preprocessing.py:160).

    Median-of-9 via Paeth's 19-comparator exchange network — pure min/max
    VPU passes. `jnp.median` lowers to a 9-wide XLA sort, which measured
    9.7 ms/iter at B=32·512² on v5e (the network is ~0.2 ms); results are
    identical (the network exactly selects the 5th order statistic)."""
    stack = _shifted_stack(x, 1)
    p = [stack[..., i] for i in range(9)]

    def mn(i, j):
        a, b = p[i], p[j]
        p[i] = jnp.minimum(a, b)
        p[j] = jnp.maximum(a, b)

    for i, j in [(1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7),
                 (1, 2), (4, 5), (7, 8), (0, 3), (5, 8), (4, 7),
                 (3, 6), (1, 4), (2, 5), (4, 7), (4, 2), (6, 4),
                 (4, 2)]:
        mn(i, j)
    return p[4]


def bilateral_filter(
    x: jnp.ndarray,
    d: int = 5,
    sigma_color: float = 50.0,
    sigma_space: float = 50.0,
) -> jnp.ndarray:
    """Edge-preserving bilateral filter on the 8-bit scale (cv2.bilateralFilter
    semantics, reference: src/data/quality_preprocessing.py:162-167). `x` is
    expected on the 0–255 scale for sigma_color to have the cv2 meaning."""
    radius = d // 2
    stack = _shifted_stack(x, radius, pad_mode="reflect")  # BORDER_REFLECT_101
    k = 2 * radius + 1
    dy, dx = jnp.meshgrid(
        jnp.arange(k) - radius, jnp.arange(k) - radius, indexing="ij"
    )
    r2 = (dy**2 + dx**2).astype(jnp.float32)
    space_w = jnp.exp(-r2 / (2.0 * sigma_space**2)).reshape(-1)
    # cv2 iterates a CIRCULAR window: taps with sqrt(dy²+dx²) > radius are
    # skipped entirely (bilateralFilter's "if r > radius continue")
    space_w = jnp.where(jnp.sqrt(r2).reshape(-1) > radius, 0.0, space_w)
    color_w = jnp.exp(
        -jnp.square(stack - x[..., None]) / (2.0 * sigma_color**2)
    )
    w = color_w * space_w
    return (stack * w).sum(axis=-1) / w.sum(axis=-1)


def suppress_artifacts(
    x: jnp.ndarray,
    percentile: float = 99.9,
    median_size: int = 3,
    bilateral_d: int = 5,
    bilateral_sigma_color: float = 50.0,
    bilateral_sigma_space: float = 50.0,
    p_high: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Artifact suppression chain (reference:
    src/data/quality_preprocessing.py:149-170): per-image percentile clip →
    round-trip to 8-bit → 3×3 median → bilateral only where bright spots remain
    (max>250 in 8-bit), then back to uint16 scale (×256). Branchless: bilateral
    is computed for the whole batch and selected per image. `p_high` lets
    the hot pipeline pass the precomputed per-image (B,1,1,1) clip value
    (ops/percentile.py fused_stats_quantile — bit-identical bisection)."""
    del median_size  # fixed 3×3, as in the reference params table
    # bisection quantile (resolution < 0.02 on the uint16 scale): this runs
    # on every pipeline batch, where an O(N log² N) TPU sort is the single
    # most expensive primitive — see per_image_quantile's own guidance
    if p_high is None:
        p_high = per_image_quantile_fast(x, percentile / 100.0)
    clipped = jnp.clip(x, 0.0, p_high)
    x8 = jnp.floor(clipped / 256.0)  # uint8 cast truncates
    from .stencil import fused_median_bilateral, stencil_kernel_ok
    from .tpu_platform import is_tpu

    if is_tpu() and stencil_kernel_ok(*x8.shape[1:]):
        # one VMEM-resident pass for both filters (ops/stencil.py) — the
        # XLA formulations are HBM-bound (the bilateral materialises a
        # 25-tap stack; the median runs ~19 full-resolution passes)
        med, bil = fused_median_bilateral(
            x8, d=bilateral_d, sigma_color=bilateral_sigma_color,
            sigma_space=bilateral_sigma_space)
    else:
        med = median_filter_3x3(x8)
        bil = bilateral_filter(
            med, d=bilateral_d, sigma_color=bilateral_sigma_color,
            sigma_space=bilateral_sigma_space,
        )
    needs_bilateral = (
        med.reshape(x.shape[0], -1).max(axis=1) > 250.0
    ).reshape(-1, 1, 1, 1)
    # cv2 bilateral returns uint8 → truncation before upscale
    out8 = jnp.where(needs_bilateral, jnp.floor(bil), med)
    return out8 * 256.0


# ---------------------------------------------------------------------------
# elastic deformation (reference: src/data/transforms.py:86-128)
# ---------------------------------------------------------------------------

def _gaussian_kernel_1d(sigma: float, truncate: float = 4.0) -> jnp.ndarray:
    radius = int(truncate * sigma + 0.5)
    xs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (xs / sigma) ** 2)
    return k / k.sum()


def gaussian_blur(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur, NHWC, edge padding."""
    if sigma <= 0:
        return x
    k = _gaussian_kernel_1d(sigma)
    r = (k.shape[0] - 1) // 2
    xp = jnp.pad(x, ((0, 0), (r, r), (0, 0), (0, 0)), mode="edge")
    x = _sep_conv(xp, k, axis=1)
    xp = jnp.pad(x, ((0, 0), (0, 0), (r, r), (0, 0)), mode="edge")
    return _sep_conv(xp, k, axis=2)


def _sep_conv(xp: jnp.ndarray, k: jnp.ndarray, axis: int) -> jnp.ndarray:
    """1-D correlation along `axis` of an already-padded NHWC array."""
    n = k.shape[0]
    size = xp.shape[axis] - n + 1
    out = jnp.zeros(
        xp.shape[:axis] + (size,) + xp.shape[axis + 1:], dtype=xp.dtype
    )
    for i in range(n):
        out = out + k[i] * jax.lax.dynamic_slice_in_dim(xp, i, size, axis=axis)
    return out


def elastic_deform(
    x: jnp.ndarray,
    key: jax.Array,
    alpha: float = 100.0,
    sigma: float = 10.0,
    method: str | None = None,
) -> jnp.ndarray:
    """Elastic deformation: Gaussian-smoothed random displacement fields +
    bilinear sampling (reference: src/data/transforms.py:117-128, which uses
    scipy gaussian_filter + map_coordinates).

    method "separable" (TPU default): gather-free two-pass resampling
    through the shifted-slice primitive (ops/warp.py), with the field
    clipped to a static bound covering >6 of its standard deviations
    (σ_field ≈ α·0.58/(2σ√π)) — scipy's per-pixel gathers run
    near-serially on TPU. DEVIATION: the x-displacement is evaluated at
    the pre-shift coordinate (standard separable approximation, tiny for
    these smooth fields). "gather": exact map_coordinates (CPU default).
    The random fields are identical between methods (same key stream)."""
    b, h, w, c = x.shape
    k1, k2 = jax.random.split(key)
    dx = jax.random.uniform(k1, (b, h, w, 1), minval=-1.0, maxval=1.0)
    dy = jax.random.uniform(k2, (b, h, w, 1), minval=-1.0, maxval=1.0)
    dx = gaussian_blur(dx, sigma) * alpha
    dy = gaussian_blur(dy, sigma) * alpha
    if method is None:
        from .tpu_platform import is_tpu

        method = "separable" if is_tpu() else "gather"
    if method == "separable":
        from .warp import elastic_separable

        sigma_field = 0.5774 / (2.0 * float(sigma) * math.sqrt(math.pi))
        bound = max(2, int(math.ceil(8.0 * alpha * sigma_field)))
        return elastic_separable(x, dy[..., 0], dx[..., 0],
                                 max_disp=min(bound, int(math.ceil(alpha))))
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords_y = yy[None, :, :, None] + dy
    coords_x = xx[None, :, :, None] + dx

    def sample_one(img, cy, cx):
        # img: (H,W,C); cy/cx: (H,W,1)
        def per_channel(ch):
            return jax.scipy.ndimage.map_coordinates(
                ch, [cy[..., 0], cx[..., 0]], order=1, mode="nearest"
            )
        return jnp.stack([per_channel(img[..., i]) for i in range(img.shape[-1])], axis=-1)

    return jax.vmap(sample_one)(x, coords_y, coords_x)


# ---------------------------------------------------------------------------
# fused preprocess entry (resize + normalize), jitted
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("size",))
def resize_and_normalize(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """uint16-scale NHWC → resized [0,1] float32 — the minimum per-sample path
    of the reference dataset (reference: src/data/dataset.py:533-551)."""
    return normalize_uint16(resize_bilinear(to_uint16_scale(x), size))
