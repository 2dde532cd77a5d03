"""Stateless, PRNG-keyed augmentation suite (batched, on device).

TPU-native rebuild of the reference's torch/torchvision augmentations:
- MicroscopyNormalize / flips / rotation / elastic / intensity / noise / blur /
  patch drop ladders (reference: src/data/transforms.py:37-330)
- grayscale-safe RandAugment with the same 12-op space and magnitude mapping
  (reference: src/data/vit_transforms.py:14-196)
- quality-aware patch augmentation (reference: src/data/vit_transforms.py:198-327)
- MixUp / CutMix (reference: src/data/vit_transforms.py:396-462)
- TTA views (reference: src/data/transforms.py:309-…)

Design: every transform is a pure function `f(x, key, ...) -> x` over NHWC
float32 batches in [0,1]; per-image randomness comes from splitting the key
over the batch axis; probability gates and op selection are branchless
(`jnp.where` / `lax.switch` under vmap), so the whole train-time augmentation
stack jit-compiles into one XLA program.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .image import gaussian_blur, per_image_quantile, elastic_deform


# ---------------------------------------------------------------------------
# normalisation
# ---------------------------------------------------------------------------

def microscopy_normalize(
    x: jnp.ndarray,
    input_range: tuple[float, float] = (0.0, 65535.0),
    output_range: tuple[float, float] = (0.0, 1.0),
    clip_percentile: tuple[float, float] | None = (1.0, 99.0),
) -> jnp.ndarray:
    """uint16 microscopy normalisation with optional per-image percentile clip
    (reference: src/data/transforms.py:37-83 MicroscopyNormalize)."""
    if clip_percentile is not None:
        lo = per_image_quantile(x, clip_percentile[0] / 100.0)
        hi = per_image_quantile(x, clip_percentile[1] / 100.0)
        x = jnp.clip(x, lo, hi)
        x = (x - lo) / (hi - lo + 1e-8)
    else:
        in_lo, in_hi = input_range
        x = (x - in_lo) / (in_hi - in_lo)
    out_lo, out_hi = output_range
    return x * (out_hi - out_lo) + out_lo


# ---------------------------------------------------------------------------
# geometric primitives
# ---------------------------------------------------------------------------

def _per_image_gate(key: jax.Array, b: int, p: float) -> jnp.ndarray:
    return (jax.random.uniform(key, (b,)) < p).reshape(b, 1, 1, 1)


def random_hflip(x: jnp.ndarray, key: jax.Array, p: float = 0.5) -> jnp.ndarray:
    gate = _per_image_gate(key, x.shape[0], p)
    return jnp.where(gate, x[:, :, ::-1, :], x)


def random_vflip(x: jnp.ndarray, key: jax.Array, p: float = 0.5) -> jnp.ndarray:
    gate = _per_image_gate(key, x.shape[0], p)
    return jnp.where(gate, x[:, ::-1, :, :], x)


def affine_warp(
    x: jnp.ndarray,
    matrices: jnp.ndarray,
    fill: float = 0.0,
) -> jnp.ndarray:
    """Batched inverse-affine warp with bilinear sampling around the centre.

    x: (B,H,W,C); matrices: (B,2,3) mapping *output* pixel coords (centred)
    to input coords. Out-of-bounds samples get `fill`.
    """
    b, h, w, c = x.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32) - cy,
        jnp.arange(w, dtype=jnp.float32) - cx,
        indexing="ij",
    )
    ones = jnp.ones_like(yy)
    # coords (3, H, W) — order [x, y, 1] to match torchvision's convention
    base = jnp.stack([xx, yy, ones], axis=0).reshape(3, -1)
    src = jnp.einsum("bij,jk->bik", matrices, base)            # (B, 2, H*W)
    sx = src[:, 0].reshape(b, h, w) + cx
    sy = src[:, 1].reshape(b, h, w) + cy

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    valid = (sx >= -0.5) & (sx <= w - 0.5) & (sy >= -0.5) & (sy <= h - 0.5)

    def gather(img, iy, ix):
        iy = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        ix = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        return img[iy, ix]                                     # (H, W, C)

    def sample_one(img, y0i, x0i, fyi, fxi):
        f00 = gather(img, y0i, x0i)
        f01 = gather(img, y0i, x0i + 1)
        f10 = gather(img, y0i + 1, x0i)
        f11 = gather(img, y0i + 1, x0i + 1)
        fyi = fyi[..., None]
        fxi = fxi[..., None]
        top = f00 * (1 - fxi) + f01 * fxi
        bot = f10 * (1 - fxi) + f11 * fxi
        return top * (1 - fyi) + bot * fyi

    out = jax.vmap(sample_one)(x, y0, x0, fy, fx)
    return jnp.where(valid[..., None], out, fill)


def _fast_warp_default() -> bool:
    from .tpu_platform import is_tpu

    return is_tpu()


def rotate(x: jnp.ndarray, angles_deg: jnp.ndarray, fill: float = 0.0,
           method: str | None = None) -> jnp.ndarray:
    """Rotate each image by its own angle (degrees, CCW).

    method "shear3" (TPU default, square images): gather-free rot90 +
    3-shear decomposition (ops/warp.py — ~30x faster on TPU; interior
    filtering differs from direct bilinear by ~1 grey level, a documented
    deviation). "gather": direct bilinear affine warp (CPU default,
    PIL-exact)."""
    if method is None:
        method = ("shear3" if _fast_warp_default()
                  and x.shape[1] == x.shape[2] else "gather")
    if method == "shear3":
        from .warp import rotate_shear3

        return rotate_shear3(x, angles_deg, fill=fill)
    theta = jnp.deg2rad(angles_deg)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # inverse rotation matrix (output→input); positive angle = CCW (PIL/TF)
    mats = jnp.stack(
        [jnp.stack([cos, -sin], -1), jnp.stack([sin, cos], -1)], axis=1
    )                                                           # (B,2,2)
    mats = jnp.concatenate([mats, jnp.zeros((x.shape[0], 2, 1))], axis=-1)
    return affine_warp(x, mats, fill=fill)


def random_rotation(
    x: jnp.ndarray, key: jax.Array, degrees: float = 90.0, fill: float = 0.0,
    method: str | None = None,
) -> jnp.ndarray:
    """Uniform rotation in [-degrees, degrees] per image (reference ladder:
    T.RandomRotation — src/data/transforms.py:246)."""
    angles = jax.random.uniform(key, (x.shape[0],), minval=-degrees, maxval=degrees)
    return rotate(x, angles, fill=fill, method=method)


def shear(x: jnp.ndarray, shear_x: jnp.ndarray, shear_y: jnp.ndarray,
          fill: float = 0.0) -> jnp.ndarray:
    b = x.shape[0]
    one = jnp.ones((b,))
    zero = jnp.zeros((b,))
    mats = jnp.stack([
        jnp.stack([one, shear_x, zero], -1),
        jnp.stack([shear_y, one, zero], -1),
    ], axis=1)
    return affine_warp(x, mats, fill=fill)


def translate(x: jnp.ndarray, tx: jnp.ndarray, ty: jnp.ndarray,
              fill: float = 0.0) -> jnp.ndarray:
    """Translate by (tx, ty) pixels per image."""
    b = x.shape[0]
    one = jnp.ones((b,))
    zero = jnp.zeros((b,))
    mats = jnp.stack([
        jnp.stack([one, zero, -tx], -1),
        jnp.stack([zero, one, -ty], -1),
    ], axis=1)
    return affine_warp(x, mats, fill=fill)


# ---------------------------------------------------------------------------
# intensity / noise
# ---------------------------------------------------------------------------

def adjust_brightness(x: jnp.ndarray, factors: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x * factors.reshape(-1, 1, 1, 1), 0.0, 1.0)


def adjust_contrast(x: jnp.ndarray, factors: jnp.ndarray) -> jnp.ndarray:
    """torchvision semantics: blend with the per-image grayscale mean."""
    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    f = factors.reshape(-1, 1, 1, 1)
    return jnp.clip((x - mean) * f + mean, 0.0, 1.0)


def adjust_sharpness(x: jnp.ndarray, factors: jnp.ndarray) -> jnp.ndarray:
    """Blend with a smoothed copy (factor>1 sharpens, <1 blurs)."""
    blurred = gaussian_blur(x, sigma=1.0)
    f = factors.reshape(-1, 1, 1, 1)
    return jnp.clip(blurred + (x - blurred) * f, 0.0, 1.0)


def auto_contrast(x: jnp.ndarray) -> jnp.ndarray:
    """Per-image min/max stretch on the 8-bit grid (TF.autocontrast)."""
    x8 = jnp.floor(x * 255.0)
    b = x.shape[0]
    flat = x8.reshape(b, -1)
    lo = flat.min(axis=1).reshape(b, 1, 1, 1)
    hi = flat.max(axis=1).reshape(b, 1, 1, 1)
    out = (x8 - lo) * (255.0 / jnp.maximum(hi - lo, 1.0))
    out = jnp.where(hi > lo, out, x8)
    return jnp.clip(jnp.round(out), 0.0, 255.0) / 255.0


def equalize(x: jnp.ndarray, method: str | None = None) -> jnp.ndarray:
    """Global histogram equalisation on the 8-bit grid (TF.equalize
    semantics: LUT from the cumulative histogram, skipping the last nonzero
    bin's contribution in the step size).

    method "onehot" (TPU default): histogram as a fused one-hot
    compare-reduce and the LUT application as a one-hot multiply-reduce —
    on TPU the sort+searchsorted pair lowers to binary-search `while`
    loops of scalar gathers and the per-pixel `take_along_axis` to ~7
    cycles/element random access (same pathology measured for CLAHE,
    ops/clahe.py). "sort" keeps the host-friendly formulation (CPU
    default). Numerically identical paths (equivalence-tested)."""
    if method is None:
        from .tpu_platform import is_tpu

        method = "onehot" if is_tpu() else "sort"
    b, h, w, c = x.shape
    x8 = jnp.clip(jnp.floor(x * 255.0), 0.0, 255.0)
    bins = jnp.arange(256, dtype=x.dtype)
    if method == "onehot":
        oh = x8.reshape(b, -1)[:, :, None] == bins             # (B, N, 256)
        hist = jnp.sum(oh.astype(jnp.float32), axis=1)         # (B, 256)
        cdf = jnp.cumsum(hist, axis=1)
    else:
        flat = jnp.sort(x8.reshape(b, -1), axis=1)
        edges = bins + 0.5
        cdf = jax.vmap(lambda s: jnp.searchsorted(s, edges, side="left"))(flat)
        cdf = cdf.astype(jnp.float32)                          # (B, 256)
        hist = jnp.diff(cdf, axis=1, prepend=0.0)
    # PIL/torchvision: step = (total - last_nonzero_count) // 255
    nonzero = hist > 0
    last_idx = 255 - jnp.argmax(nonzero[:, ::-1], axis=1)
    last_count = jnp.take_along_axis(hist, last_idx[:, None], axis=1)[:, 0]
    step = jnp.floor((h * w * c - last_count) / 255.0)
    lut = jnp.floor((cdf - hist / 2.0 + step[:, None] / 2.0)
                    / jnp.maximum(step, 1.0)[:, None])
    lut = jnp.clip(lut, 0.0, 255.0)
    if method == "onehot":
        out = jnp.sum(
            (x8.reshape(b, -1)[:, :, None] == bins).astype(jnp.float32)
            * lut[:, None, :], axis=-1).reshape(b, h, w, c)
    else:
        idx = x8.astype(jnp.int32).reshape(b, -1)
        out = jnp.take_along_axis(lut, idx, axis=1).reshape(b, h, w, c)
    out = jnp.where((step > 0).reshape(b, 1, 1, 1), out, x8)
    return out / 255.0


def posterize(x: jnp.ndarray, bits: jnp.ndarray) -> jnp.ndarray:
    """Keep the top `bits` bits of each 8-bit value (per-image bits)."""
    x8 = jnp.clip(jnp.floor(x * 255.0), 0.0, 255.0)
    shift = (8 - bits).astype(jnp.int32).reshape(-1, 1, 1, 1)
    q = jnp.left_shift(
        jnp.right_shift(x8.astype(jnp.int32), shift), shift
    ).astype(x.dtype)
    return q / 255.0


def solarize(x: jnp.ndarray, thresholds: jnp.ndarray) -> jnp.ndarray:
    """Invert pixels ≥ threshold (thresholds per image, in [0,1])."""
    t = thresholds.reshape(-1, 1, 1, 1)
    return jnp.where(x >= t, 1.0 - x, x)


def gaussian_noise(x: jnp.ndarray, key: jax.Array, std: float) -> jnp.ndarray:
    return x + jax.random.normal(key, x.shape) * std


def random_blur(x: jnp.ndarray, key: jax.Array,
                sigma_range: tuple[float, float] = (0.0, 1.0)) -> jnp.ndarray:
    """Per-image random σ blur: computed at max σ and cross-faded per image.
    (A per-image exact σ would need a dynamic kernel; the blend matches the
    reference's visual effect while staying shape-static.)"""
    b = x.shape[0]
    sig = jax.random.uniform(key, (b,), minval=sigma_range[0], maxval=sigma_range[1])
    hi = max(sigma_range[1], 1e-3)
    blurred = gaussian_blur(x, sigma=hi)
    t = (sig / hi).reshape(b, 1, 1, 1)
    return x * (1 - t) + blurred * t


# ---------------------------------------------------------------------------
# microscopy augmentation (reference: src/data/transforms.py:131-182)
# ---------------------------------------------------------------------------

def microscopy_augment(
    x: jnp.ndarray,
    key: jax.Array,
    brightness_range: tuple[float, float] = (0.8, 1.2),
    contrast_range: tuple[float, float] = (0.8, 1.2),
    noise_std: float = 0.02,
    blur_sigma_range: tuple[float, float] = (0.0, 1.0),
    p: float = 0.5,
) -> jnp.ndarray:
    b = x.shape[0]
    keys = jax.random.split(key, 9)
    out = x
    g = _per_image_gate(keys[0], b, 0.5)
    f = jax.random.uniform(keys[1], (b,), minval=brightness_range[0], maxval=brightness_range[1])
    out = jnp.where(g, out * f.reshape(-1, 1, 1, 1), out)
    g = _per_image_gate(keys[2], b, 0.5)
    f = jax.random.uniform(keys[3], (b,), minval=contrast_range[0], maxval=contrast_range[1])
    mean = out.mean(axis=(1, 2, 3), keepdims=True)
    out = jnp.where(g, (out - mean) * f.reshape(-1, 1, 1, 1) + mean, out)
    g = _per_image_gate(keys[4], b, 0.3)
    out = jnp.where(g, gaussian_noise(out, keys[5], noise_std), out)
    g = _per_image_gate(keys[6], b, 0.3)
    out = jnp.where(g, random_blur(out, keys[7], blur_sigma_range), out)
    out = jnp.clip(out, 0.0, 1.0)
    gate_all = _per_image_gate(keys[8], b, p)
    return jnp.where(gate_all, out, x)


def random_patch_drop(
    x: jnp.ndarray,
    key: jax.Array,
    patch_size: int = 32,
    max_patches: int = 5,
    p: float = 0.3,
) -> jnp.ndarray:
    """Drop up to `max_patches` random rectangles to their own mean value
    (reference: src/data/transforms.py:184-212). Static unroll with per-patch
    active masks."""
    b, h, w, c = x.shape
    keys = jax.random.split(key, 2 + max_patches)
    gate = _per_image_gate(keys[0], b, p)
    n_active = jax.random.randint(keys[1], (b,), 1, max_patches + 1)
    yy = jnp.arange(h).reshape(1, h, 1, 1)
    xx = jnp.arange(w).reshape(1, 1, w, 1)
    out = x
    for i in range(max_patches):
        ky, kx = jax.random.split(keys[2 + i])
        y0 = jax.random.randint(ky, (b, 1, 1, 1), 0, max(h - patch_size, 1))
        x0 = jax.random.randint(kx, (b, 1, 1, 1), 0, max(w - patch_size, 1))
        in_patch = (
            (yy >= y0) & (yy < y0 + patch_size) & (xx >= x0) & (xx < x0 + patch_size)
        )
        # per-channel patch mean: the numerator keeps C, the (B,1,1,1)
        # area counts pixels once — summing C into the numerator would
        # fill with C× the true mean on multi-channel input
        area = in_patch.sum(axis=(1, 2), keepdims=True)
        mean_val = (out * in_patch).sum(axis=(1, 2), keepdims=True) \
            / jnp.maximum(area, 1)
        active = (i < n_active).reshape(b, 1, 1, 1) & gate
        out = jnp.where(active & in_patch, mean_val, out)
    return out


# ---------------------------------------------------------------------------
# RandAugment (reference: src/data/vit_transforms.py:14-196)
# ---------------------------------------------------------------------------

def _mag(m: float, lo: float, hi: float) -> float:
    """Reference magnitude mapping: lo + (hi−lo)·m/30 (vit_transforms.py:63-66)."""
    return lo + (hi - lo) * m / 30.0


def randaugment(
    x: jnp.ndarray,
    key: jax.Array,
    n: int = 2,
    m: float = 9.0,
    fill: float = 1.0,
) -> jnp.ndarray:
    """Grayscale-safe RandAugment over the reference's 12-op space. Each of
    the `n` rounds picks one op per image (branchless lax.switch under vmap)."""
    b = x.shape[0]

    def op_autocontrast(img, _):
        return auto_contrast(img)

    def op_brightness(img, _):
        return adjust_brightness(img, jnp.full((img.shape[0],), _mag(m, 0.05, 1.95)))

    def op_contrast(img, _):
        return adjust_contrast(img, jnp.full((img.shape[0],), _mag(m, 0.05, 1.95)))

    def op_equalize(img, _):
        return equalize(img)

    def op_posterize(img, _):
        return posterize(img, jnp.full((img.shape[0],), int(_mag(m, 8, 4))))

    def op_rotate(img, _):
        # gather path kept deliberately — see the measurement note below
        return rotate(img, jnp.full((img.shape[0],), _mag(m, -30.0, 30.0)),
                      fill=fill, method="gather")

    def op_sharpness(img, _):
        return adjust_sharpness(img, jnp.full((img.shape[0],), _mag(m, 0.05, 1.95)))

    # NOTE (measured, v5e round 2): inside this function's vmapped
    # lax.switch every branch executes for every image, and there the
    # shifted-slice warps LOSE: routing rotate/shear/translate through
    # ops/warp.py measured 106.6 ms/batch vs 28.8 ms with the affine
    # gather ops below (the batched per-image advanced-indexing gather
    # lowers efficiently here, unlike take_along_axis row gathers). The
    # fast warps stay for the ladder path (train_augment), where they are
    # 17x — don't re-route these without re-measuring.
    def op_shear_x(img, _):
        s = jnp.full((img.shape[0],), _mag(m, -0.3, 0.3))
        return shear(img, s, jnp.zeros_like(s), fill=fill)

    def op_shear_y(img, _):
        s = jnp.full((img.shape[0],), _mag(m, -0.3, 0.3))
        return shear(img, jnp.zeros_like(s), s, fill=fill)

    def op_solarize(img, _):
        return solarize(img, jnp.full((img.shape[0],), _mag(m, 1.0, 0.0)))

    def op_translate_x(img, _):
        t = jnp.full((img.shape[0],), _mag(m, -0.3, 0.3) * img.shape[2])
        return translate(img, t, jnp.zeros_like(t), fill=fill)

    def op_translate_y(img, _):
        t = jnp.full((img.shape[0],), _mag(m, -0.3, 0.3) * img.shape[1])
        return translate(img, jnp.zeros_like(t), t, fill=fill)

    ops = [op_autocontrast, op_brightness, op_contrast, op_equalize,
           op_posterize, op_rotate, op_sharpness, op_shear_x, op_shear_y,
           op_solarize, op_translate_x, op_translate_y]

    def apply_round(img, rkey):
        choice = jax.random.randint(rkey, (b,), 0, len(ops))

        def per_image(one_img, c):
            branches = [lambda im, f=f: f(im[None], None)[0] for f in ops]
            return jax.lax.switch(c, branches, one_img)

        return jax.vmap(per_image)(img, choice)

    out = x
    for rkey in jax.random.split(key, n):
        out = apply_round(out, rkey)
    return jnp.clip(out, 0.0, 1.0)


# ---------------------------------------------------------------------------
# quality-aware patch augmentation (reference: vit_transforms.py:198-327)
# ---------------------------------------------------------------------------

def compute_patch_quality(x: jnp.ndarray, patch_size: int = 16) -> jnp.ndarray:
    """Per-patch quality: (contrast + intensity-centredness + variance)/3
    (reference: vit_transforms.py:217-250). x: (B,H,W,C) → (B, pH, pW)."""
    b, h, w, c = x.shape
    ph, pw = h // patch_size, w // patch_size
    patches = x.reshape(b, ph, patch_size, pw, patch_size, c)
    patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(b, ph, pw, -1)
    contrast = patches.std(axis=-1)
    mean_i = patches.mean(axis=-1)
    intensity_quality = 1.0 - 2.0 * jnp.abs(mean_i - 0.5)
    local_var = patches.var(axis=-1)
    return (contrast + intensity_quality + local_var) / 3.0


def quality_aware_patch_augment(
    x: jnp.ndarray,
    key: jax.Array,
    patch_size: int = 16,
    quality_threshold: float = 0.7,
    strong_aug_prob: float = 0.8,
    patch_drop_prob: float = 0.1,
) -> jnp.ndarray:
    """Strongly augment (noise/blur/brightness/contrast) or drop low-quality
    patches, branchless over the patch grid."""
    b, h, w, c = x.shape
    ph, pw = h // patch_size, w // patch_size
    quality = compute_patch_quality(x, patch_size)              # (B,pH,pW)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)

    low_q = quality < quality_threshold
    strong = low_q & (jax.random.uniform(k1, (b, ph, pw)) < strong_aug_prob)
    drop = low_q & (jax.random.uniform(k2, (b, ph, pw)) < patch_drop_prob)
    aug_type = jax.random.randint(k3, (b, ph, pw), 0, 4)

    up = lambda a: jnp.repeat(jnp.repeat(a, patch_size, 1), patch_size, 2)[..., None]

    noise = x + jax.random.normal(k4, x.shape) * 0.05
    blur = gaussian_blur(x, sigma=1.0)
    bright = x * jax.random.uniform(k5, (b, 1, 1, 1), minval=0.7, maxval=1.3)
    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    contr = (x - mean) * 1.3 + mean

    aug = jnp.where(up(aug_type == 0), noise,
          jnp.where(up(aug_type == 1), blur,
          jnp.where(up(aug_type == 2), bright, contr)))
    out = jnp.where(up(strong), aug, x)
    out = jnp.where(up(drop), 0.0, out)
    return jnp.clip(out, 0.0, 1.0)


# ---------------------------------------------------------------------------
# MixUp / CutMix (reference: vit_transforms.py:396-462)
# ---------------------------------------------------------------------------

def mixup(x: jnp.ndarray, labels: jnp.ndarray, key: jax.Array, alpha: float = 0.8):
    """Returns (mixed_x, labels_a, labels_b, lam)."""
    k1, k2 = jax.random.split(key)
    lam = jax.random.beta(k1, alpha, alpha) if alpha > 0 else jnp.float32(1.0)
    index = jax.random.permutation(k2, x.shape[0])
    mixed = lam * x + (1.0 - lam) * x[index]
    return mixed, labels, labels[index], lam


def cutmix(x: jnp.ndarray, labels: jnp.ndarray, key: jax.Array, alpha: float = 1.0):
    """Returns (mixed_x, labels_a, labels_b, lam) with the λ correction to the
    realised box area."""
    b, h, w, _ = x.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lam = jax.random.beta(k1, alpha, alpha) if alpha > 0 else jnp.float32(1.0)
    index = jax.random.permutation(k2, b)
    cut_rat = jnp.sqrt(1.0 - lam)
    cut_h = jnp.floor(h * cut_rat).astype(jnp.int32)
    cut_w = jnp.floor(w * cut_rat).astype(jnp.int32)
    cy = jax.random.randint(k3, (), 0, h)
    cx = jax.random.randint(k4, (), 0, w)
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)
    yy = jnp.arange(h).reshape(1, h, 1, 1)
    xx = jnp.arange(w).reshape(1, 1, w, 1)
    in_box = (yy >= y1) & (yy < y2) & (xx >= x1) & (xx < x2)
    mixed = jnp.where(in_box, x[index], x)
    lam_adj = 1.0 - ((x2 - x1) * (y2 - y1)) / (h * w)
    return mixed, labels, labels[index], lam_adj


@partial(jax.jit, static_argnames=("mixup_alpha", "cutmix_alpha", "prob",
                                   "switch_prob"))
def mixup_cutmix(
    x: jnp.ndarray,
    labels: jnp.ndarray,
    key: jax.Array,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    prob: float = 1.0,
    switch_prob: float = 0.5,
):
    """Fused batch MixUp/CutMix for the training step (reference:
    src/data/vit_transforms.py:396-462, which defines both but leaves them
    for the training loop to apply). One shared permutation; a per-batch
    Bernoulli picks CutMix vs MixUp when both alphas are active; `prob`
    gates application entirely. Returns (mixed_x, labels_a, labels_b, lam).
    Branchless (jnp.where) so it stays a single compiled program."""
    b, h, w, _ = x.shape
    k_perm, k_switch, k_lm, k_lc, k_cy, k_cx, k_apply = jax.random.split(key, 7)
    index = jax.random.permutation(k_perm, b)
    shuffled = x[index]

    lam = jnp.float32(1.0)
    mixed = x
    if mixup_alpha > 0:
        lam_m = jax.random.beta(k_lm, mixup_alpha, mixup_alpha)
        mixed_m = lam_m * x + (1.0 - lam_m) * shuffled
    if cutmix_alpha > 0:
        lam_c0 = jax.random.beta(k_lc, cutmix_alpha, cutmix_alpha)
        cut_rat = jnp.sqrt(1.0 - lam_c0)
        cut_h = jnp.floor(h * cut_rat).astype(jnp.int32)
        cut_w = jnp.floor(w * cut_rat).astype(jnp.int32)
        cy = jax.random.randint(k_cy, (), 0, h)
        cx = jax.random.randint(k_cx, (), 0, w)
        y1, y2 = jnp.clip(cy - cut_h // 2, 0, h), jnp.clip(cy + cut_h // 2, 0, h)
        x1, x2 = jnp.clip(cx - cut_w // 2, 0, w), jnp.clip(cx + cut_w // 2, 0, w)
        yy = jnp.arange(h).reshape(1, h, 1, 1)
        xx = jnp.arange(w).reshape(1, 1, w, 1)
        in_box = (yy >= y1) & (yy < y2) & (xx >= x1) & (xx < x2)
        mixed_c = jnp.where(in_box, shuffled, x)
        # λ corrected to the realised box area (reference vit_transforms.py:455)
        lam_c = 1.0 - ((x2 - x1) * (y2 - y1)).astype(jnp.float32) / (h * w)
    if mixup_alpha > 0 and cutmix_alpha > 0:
        use_cut = jax.random.bernoulli(k_switch, switch_prob)
        mixed = jnp.where(use_cut, mixed_c, mixed_m)
        lam = jnp.where(use_cut, lam_c, lam_m)
    elif mixup_alpha > 0:
        mixed, lam = mixed_m, lam_m
    elif cutmix_alpha > 0:
        mixed, lam = mixed_c, lam_c
    if prob < 1.0:
        apply = jax.random.bernoulli(k_apply, prob)
        mixed = jnp.where(apply, mixed, x)
        lam = jnp.where(apply, lam, 1.0)
    return mixed, labels, labels[index], lam


# ---------------------------------------------------------------------------
# composed pipelines (reference: src/data/transforms.py:214-330)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("level",))
def train_augment(
    x: jnp.ndarray,
    key: jax.Array,
    level: str = "medium",
) -> jnp.ndarray:
    """The light/medium/heavy augmentation ladder on [0,1] NHWC batches,
    mirroring get_training_transforms (reference: src/data/transforms.py:214-276).
    Normalisation and resize happen upstream in the data pipeline."""
    if level == "none":
        return x
    keys = jax.random.split(key, 9)
    x = random_hflip(x, keys[0], 0.5)
    x = random_vflip(x, keys[1], 0.5)
    x = random_rotation(x, keys[2], degrees=180.0 if level == "heavy" else 90.0)
    if level in ("medium", "heavy"):
        heavy = level == "heavy"
        gate = _per_image_gate(keys[3], x.shape[0], 0.5 if heavy else 0.3)
        warped = elastic_deform(x, keys[4], alpha=80.0 if heavy else 50.0, sigma=5.0)
        x = jnp.where(gate, warped, x)
        x = microscopy_augment(
            x, keys[5],
            brightness_range=(0.7, 1.3) if heavy else (0.8, 1.2),
            contrast_range=(0.7, 1.3) if heavy else (0.8, 1.2),
            noise_std=0.03 if heavy else 0.02,
            p=0.7 if heavy else 0.5,
        )
    if level == "heavy":
        x = random_patch_drop(x, keys[6], patch_size=32, max_patches=5, p=0.3)
        gate = _per_image_gate(keys[7], x.shape[0], 0.3)
        x = jnp.where(gate, random_blur(x, keys[8], (0.1, 2.0)), x)
    return jnp.clip(x, 0.0, 1.0)


@partial(jax.jit, static_argnames=("use_randaugment", "use_patch_quality",
                                   "randaugment_n", "randaugment_m",
                                   "patch_quality_p"))
def vit_augment(
    x: jnp.ndarray,
    key: jax.Array,
    use_randaugment: bool = True,
    use_patch_quality: bool = True,
    randaugment_n: int = 2,
    randaugment_m: float = 9.0,
    patch_quality_p: float = 0.5,
) -> jnp.ndarray:
    """ViT training pipeline (reference: create_vit_transform —
    src/data/vit_transforms.py:330-392): flips + RandAugment(n,m) +
    quality-aware patch augmentation. Flags/magnitudes are plumbed from
    the augmentation config by the data pipeline (vit_aug_params)."""
    keys = jax.random.split(key, 5)
    x = random_hflip(x, keys[0], 0.5)
    x = random_vflip(x, keys[1], 0.5)
    if use_randaugment:
        x = randaugment(x, keys[2], n=randaugment_n, m=randaugment_m)
    if use_patch_quality:
        gate = _per_image_gate(keys[3], x.shape[0], patch_quality_p)
        x = jnp.where(gate, quality_aware_patch_augment(x, keys[4]), x)
    return x


def tta_views(x: jnp.ndarray) -> list[jnp.ndarray]:
    """The 5 deterministic TTA views: identity, hflip, vflip, rot90, rot270
    (reference: get_tta_transforms — src/data/transforms.py:309-…)."""
    return [
        x,
        x[:, :, ::-1, :],
        x[:, ::-1, :, :],
        jnp.rot90(x, k=1, axes=(1, 2)),
        jnp.rot90(x, k=3, axes=(1, 2)),
    ]
