"""Batched CLAHE (Contrast-Limited Adaptive Histogram Equalization) on device.

Rebuilds the semantics of the reference's cv2-based CLAHE round-trip
(reference: src/data/quality_preprocessing.py:125-147):

  1. normalise the uint16 image to its own [min, max] → 8-bit (0..255)
  2. CLAHE on the 8-bit image: per-tile histogram → clip at
     `clip_limit * tile_area / 256` → redistribute excess → CDF → LUT,
     then bilinear interpolation between the 4 neighbouring tile LUTs
  3. scale back to the original [min, max] uint16 range

TPU-first formulation (round-2 profile-driven rewrite): per-tile
histograms are ONE-HOT COMPARE-REDUCES (bins on lanes, fused by XLA — no
scatter, no sort, no searchsorted: the original sort+searchsorted sweep
lowered to binary-search `while` loops of scalar gathers that measured
~1.56 s/iter at B=32·512², ~75% of the whole quality pipeline), and the
per-pixel LUT application uses the HALF-TILE QUADRANT structure of cv2's
bilinear blend: within each half-tile block every pixel shares the same 4
neighbour LUTs, so the lookup becomes a one-hot multiply-reduce against 4
per-block LUT rows (VPU streaming math, no per-pixel random access — the
flat-gather formulation measured ~60 ms per gather pass, ~7 cycles per
element). CPU keeps the sort/gather paths (memcpy-class there); both
implementations are golden-tested against cv2.

Deviation from cv2 (documented): excess redistribution adds `excess/256`
uniformly as float instead of cv2's integer step distribution — differences
are sub-1-bin and wash out through the ±0.5 rounding of the LUT.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _is_tpu() -> bool:
    from .tpu_platform import is_tpu

    return is_tpu()


def _tile_cdfs(x8: jnp.ndarray, grid: tuple[int, int], clip_limit: float,
               method: str | None = None) -> jnp.ndarray:
    """Per-tile clipped-histogram CDF-based LUTs.

    x8: (B, H, W) float in [0, 255] (integer-valued bins).
    Returns luts: (B, gh, gw, 256) float LUT (0..255).
    method: "onehot" (TPU default — fused compare-reduce histogram) or
    "sort" (CPU default — sort + searchsorted; the one-hot stream is
    256x the pixel count, fine on the VPU but slow on host SIMD).
    """
    b, h, w = x8.shape
    gh, gw = grid
    th, tw = h // gh, w // gw
    area = th * tw
    if method is None:
        method = "onehot" if _is_tpu() else "sort"

    tiles = x8.reshape(b, gh, th, gw, tw).transpose(0, 1, 3, 2, 4).reshape(b, gh, gw, area)
    if method == "onehot":
        # NOTE (round-3): an MXU nibble-split hist (onehot_hi^T @ onehot_lo
        # per tile) was analysed and rejected — per-tile (16, area)x(area, 16)
        # dots run at 1/64 MXU utilisation (~2x SLOWER than this compare-
        # reduce), and packing tiles into M/N only pads K with masked zeros.
        # This formulation measures within ~25% of its VPU floor.
        bins = jnp.arange(256, dtype=x8.dtype)
        v = jnp.clip(tiles, 0, 255)
        hist = jnp.sum((v[..., None] == bins).astype(jnp.float32), axis=-2)
    else:
        tiles_sorted = jnp.sort(tiles, axis=-1)

        # cdf_raw[v] = #pixels <= v, via vectorised binary search over 256
        # bin edges.
        edges = jnp.arange(256, dtype=x8.dtype) + 0.5

        def searchsorted_tile(sorted_tile):
            return jnp.searchsorted(sorted_tile, edges, side="left")

        cdf_raw = jax.vmap(jax.vmap(jax.vmap(searchsorted_tile)))(tiles_sorted)
        cdf_raw = cdf_raw.astype(jnp.float32)                  # (b, gh, gw, 256)
        hist = jnp.diff(cdf_raw, axis=-1, prepend=0.0)

    # Clip + redistribute, integer-exact to cv2's clahe.cpp: the absolute clip
    # limit is max(int(clipLimit·area/256), 1); every bin gains excess//256,
    # and the residual is dropped +1 at a time on bins 0, step, 2·step, …
    # with step = max(256//residual, 1).
    clip = float(max(int(clip_limit * area / 256.0), 1))
    clipped = jnp.minimum(hist, clip)
    excess = (hist - clipped).sum(axis=-1, keepdims=True)
    batch_inc = jnp.floor(excess / 256.0)
    residual = excess - batch_inc * 256.0
    step = jnp.maximum(jnp.floor(256.0 / jnp.maximum(residual, 1.0)), 1.0)
    bins = jnp.arange(256, dtype=jnp.float32)
    residual_inc = jnp.where(
        (jnp.mod(bins, step) == 0) & (jnp.floor(bins / step) < residual), 1.0, 0.0
    )
    redistributed = clipped + batch_inc + residual_inc

    if _is_tpu():
        # cumsum over the 256 bins lowers to a 256-wide reduce-window
        # (~4.4 ms/iter at B=32·512² across the two pipeline CLAHE calls);
        # as a triangular matmul the MXU does it in ~0.02 ms. Exact: all
        # values are integer-valued f32 with sums < 2²⁴.
        tri = jnp.triu(jnp.ones((256, 256), jnp.float32))
        cdf = jax.lax.dot_general(
            redistributed.reshape(-1, 256), tri, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(redistributed.shape)
    else:
        cdf = jnp.cumsum(redistributed, axis=-1)
    # cv2 LUT: saturate_cast<uchar>(cdf * (255 / area))
    luts = jnp.clip(jnp.round(cdf * (255.0 / area)), 0.0, 255.0)
    return luts


def _interp_luts_onehot(x8: jnp.ndarray, luts: jnp.ndarray,
                        grid: tuple[int, int]) -> jnp.ndarray:
    """Quadrant one-hot LUT application + bilinear blend (TPU fast path).

    cv2's tile coordinate is y/th − 0.5, so the blend grid is the HALF-TILE
    grid: within half-block (hy, hx) every pixel uses the same 4 neighbour
    tiles (y0 = clip((hy−1)//2), y1 = clip(y0_unclamped+1)). The lookup
    `lut[v]` then becomes a one-hot multiply-reduce of the pixel block
    against 4 shared (256,) LUT rows — streaming VPU math instead of
    per-pixel random access. Requires even tile sides.
    """
    b, h, w = x8.shape
    gh, gw = grid
    th, tw = h // gh, w // gw
    t2h, t2w = th // 2, tw // 2
    H2, W2 = 2 * gh, 2 * gw

    import numpy as np

    hy = np.arange(H2)
    hx = np.arange(W2)
    y0 = np.clip((hy - 1) // 2, 0, gh - 1)
    y1 = np.clip((hy - 1) // 2 + 1, 0, gh - 1)
    x0 = np.clip((hx - 1) // 2, 0, gw - 1)
    x1 = np.clip((hx - 1) // 2 + 1, 0, gw - 1)

    # pixels regrouped by half-block: (b, H2, W2, t2h, t2w)
    xq = jnp.clip(x8, 0, 255).reshape(b, H2, t2h, W2, t2w).transpose(
        0, 1, 3, 2, 4)
    bins = jnp.arange(256, dtype=x8.dtype)
    oh = (xq[..., None] == bins)                  # (b,H2,W2,t2h,t2w,256)

    def corner(yi, xi):
        lc = luts[:, yi][:, :, xi]                # (b, H2, W2, 256)
        return jnp.sum(
            oh * lc[:, :, :, None, None, :], axis=-1)   # (b,H2,W2,t2h,t2w)

    f00 = corner(y0, x0)
    f01 = corner(y0, x1)
    f10 = corner(y1, x0)
    f11 = corner(y1, x1)

    ys = jnp.arange(h, dtype=jnp.float32) / th - 0.5
    xs = jnp.arange(w, dtype=jnp.float32) / tw - 0.5
    wy = (ys - jnp.floor(ys)).reshape(1, H2, 1, t2h, 1)
    wx = (xs - jnp.floor(xs)).reshape(1, 1, W2, 1, t2w)
    top = f00 * (1 - wx) + f01 * wx
    bot = f10 * (1 - wx) + f11 * wx
    out = top * (1 - wy) + bot * wy
    return out.transpose(0, 1, 3, 2, 4).reshape(b, h, w)


def _quadrant_apply_kernel(x_ref, ltop_ref, lbot_ref, o_ref, *,
                           tile_hw: tuple[int, int], n_h2: int):
    """One half-block ROW of the quadrant LUT apply, fully VMEM-resident.

    The XLA one-hot formulation recomputes the (pixels, 256) compare for
    every corner (the materialised one-hot would be ~2 GB at B=32·512², so
    XLA must rematerialise it inside each corner's reduce fusion — ~33 ms of
    the round-2 profile). Here:

    * the two neighbouring TILE ROWS of raw LUTs arrive via computed
      BlockSpec index maps (y0/y1 of cv2's clamped half-tile indexing) — no
      corner-plane materialisation in HBM (at grid 32×32 that array would
      be 512 MB/iter of traffic);
    * the x-direction bilinear blend is folded into the lane-expansion
      matmul: tab = [ltop; lbot]ᵀ·E where E[g, x] = (g==x0(x))·(1−wx(x)) +
      (g==x1(x))·wx(x) — one MXU pass produces the 512 per-(bin, lane)
      blended LUT rows;
    * the per-pixel table lookup tab[x] is a CHUNKED BIT-SELECT TREE over
      the pixel value's 8 bits: 8 chunks of 32 leaf rows collapse through
      5 select levels, then 3 more selects pick the chunk — 255 vector
      selects total on the (t2h, 2W) [top|bot] pair instead of 256
      compare+fma steps (the one-hot k-loop's 1024 VPU ops). Pure
      selection, so the result is tab[x] exactly. The block stays in its
      natural (sublane, lane) layout throughout — no relayouts, no gathers.

    x_ref: (1, t2h, W) integer-valued pixels 0..255; ltop/lbot:
    (1, 1, gw, 256).
    """
    th, tw = tile_hw
    t2h, t2w = th // 2, tw // 2
    x = x_ref[0].astype(jnp.float32)                      # (t2h, W)
    w = x.shape[1]
    gw = ltop_ref.shape[2]

    # blend weights + clamped neighbour-column indices, analytic per lane
    xpos = jax.lax.broadcasted_iota(jnp.int32, (gw, w), 1)
    hx = xpos // t2w
    x0 = jnp.clip((hx - 1) // 2, 0, gw - 1)
    x1 = jnp.clip((hx - 1) // 2 + 1, 0, gw - 1)
    rx = (xpos % t2w).astype(jnp.float32) / tw
    wx = jnp.where(hx % 2 == 0, rx + 0.5, rx)              # (gw, W)
    g = jax.lax.broadcasted_iota(jnp.int32, (gw, w), 0)
    expand = (jnp.where(g == x0, 1.0 - wx, 0.0)
              + jnp.where(g == x1, wx, 0.0))               # (gw, W)

    top = jax.lax.dot_general(
        ltop_ref[0, 0].astype(jnp.float32), expand, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (256, W)
    bot = jax.lax.dot_general(
        lbot_ref[0, 0].astype(jnp.float32), expand, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    tab = jnp.concatenate([top, bot], axis=1)              # (256, 2W)

    hy = pl.program_id(0) % n_h2
    ry = jax.lax.broadcasted_iota(jnp.int32, (t2h, 1), 0).astype(
        jnp.float32) / th
    wy = jnp.where(hy % 2 == 0, ry + 0.5, ry)              # (t2h, 1)

    xi = jnp.concatenate([x, x], axis=1).astype(jnp.int32)  # (t2h, 2W)
    bits = [((xi >> j) & 1) == 1 for j in range(8)]

    # 8 chunks of 32 leaves → 5 select levels each, 3 levels across chunks.
    # Chunking bounds live intermediates to 16 (t2h, 2W) arrays.
    chunks = []
    for c in range(8):
        lvl = [tab[c * 32 + i: c * 32 + i + 1, :] for i in range(32)]
        for j in range(5):
            lvl = [jnp.where(bits[j], lvl[2 * i + 1], lvl[2 * i])
                   for i in range(len(lvl) // 2)]
        chunks.append(lvl[0])
    for j in range(5, 8):
        chunks = [jnp.where(bits[j], chunks[2 * i + 1], chunks[2 * i])
                  for i in range(len(chunks) // 2)]
    res = chunks[0]                                        # (t2h, 2W)
    w_lanes = x.shape[1]
    o_ref[0] = (res[:, :w_lanes] * (1.0 - wy)
                + res[:, w_lanes:] * wy).astype(o_ref.dtype)


def _interp_luts_pallas(x8: jnp.ndarray, luts: jnp.ndarray,
                        grid: tuple[int, int],
                        interpret: bool | None = None) -> jnp.ndarray:
    """Pallas quadrant LUT apply: one shared compare for all 4 corners.

    Same quadrant structure (and neighbour-tile indexing) as
    `_interp_luts_onehot`; measured against it on the round-2 33 ms/iter
    corner reduces. Requires even tile sides.
    """
    if interpret is None:
        interpret = not _is_tpu()
    b, h, w = x8.shape
    gh, gw = grid
    th, tw = h // gh, w // gw
    t2h, t2w = th // 2, tw // 2
    H2 = 2 * gh

    def top_map(i):
        hy = i % H2
        return (i // H2, jnp.clip((hy - 1) // 2, 0, gh - 1), 0, 0)

    def bot_map(i):
        hy = i % H2
        return (i // H2, jnp.clip((hy - 1) // 2 + 1, 0, gh - 1), 0, 0)

    xrows = jnp.clip(x8, 0, 255).reshape(b * H2, t2h, w)
    kernel = partial(_quadrant_apply_kernel, tile_hw=(th, tw), n_h2=H2)
    out = pl.pallas_call(
        kernel,
        grid=(b * H2,),
        in_specs=[
            pl.BlockSpec((1, t2h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, gw, 256), top_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, gw, 256), bot_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t2h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * H2, t2h, w), x8.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            allow_input_fusion=(True, False, False)),
        interpret=interpret,
    )(xrows, luts.reshape(b, gh, gw, 256), luts.reshape(b, gh, gw, 256))
    return out.reshape(b, h, w)


def _interp_luts(x8: jnp.ndarray, luts: jnp.ndarray, grid: tuple[int, int]) -> jnp.ndarray:
    """Bilinear interpolation between the 4 neighbouring tile LUTs
    (flat-gather path — CPU default; per-pixel random access).

    x8: (B, H, W) bins; luts: (B, gh, gw, 256) → (B, H, W) float 0..255.
    """
    b, h, w = x8.shape
    gh, gw = grid
    th, tw = h // gh, w // gw

    # Tile coordinates exactly as cv2's clahe.cpp: tyf = y/th − 0.5,
    # ty1 = floor(tyf) (then clamped), weight = tyf − floor(tyf); the edge
    # tiles' mappings extend outwards via the index clamp.
    ys = jnp.arange(h, dtype=jnp.float32) / th - 0.5
    xs = jnp.arange(w, dtype=jnp.float32) / tw - 0.5
    wy = (ys - jnp.floor(ys))[None, :, None]                   # (1, H, 1)
    wx = (xs - jnp.floor(xs))[None, None, :]                   # (1, 1, W)
    # Second index comes from the *unclamped* floor (cv2: ty2 = ty1+1 before
    # the clamps), so at the left/top edge both indices collapse to tile 0.
    y0f = jnp.floor(ys)
    x0f = jnp.floor(xs)
    y0 = jnp.clip(y0f, 0, gh - 1).astype(jnp.int32)
    x0 = jnp.clip(x0f, 0, gw - 1).astype(jnp.int32)
    y1 = jnp.clip(y0f + 1, 0, gh - 1).astype(jnp.int32)
    x1 = jnp.clip(x0f + 1, 0, gw - 1).astype(jnp.int32)

    v = jnp.clip(x8, 0, 255).astype(jnp.int32)                 # (B, H, W)
    flat_luts = luts.reshape(-1)
    b_idx = jnp.arange(b, dtype=jnp.int32).reshape(b, 1, 1)

    def gather(yy, xx):
        # luts[b, yy[h], xx[w], v[b,h,w]] as ONE flat gather of B·H·W
        # elements — never materialises a (B, H, W, 256) intermediate
        # (at 512² split scale that would be tens of GB).
        idx = ((b_idx * gh + yy.reshape(1, h, 1)) * gw
               + xx.reshape(1, 1, w)) * 256 + v
        return jnp.take(flat_luts, idx)

    f00 = gather(y0, x0)
    f01 = gather(y0, x1)
    f10 = gather(y1, x0)
    f11 = gather(y1, x1)
    top = f00 * (1 - wx) + f01 * wx
    bot = f10 * (1 - wx) + f11 * wx
    return top * (1 - wy) + bot * wy


@partial(jax.jit, static_argnames=("grid", "clip_limit", "method"))
def clahe_8bit(x8: jnp.ndarray, clip_limit: float = 2.0,
               grid: tuple[int, int] = (8, 8),
               method: str | None = None) -> jnp.ndarray:
    """CLAHE on integer-valued (B, H, W) arrays in [0, 255]. H, W must be
    divisible by the grid (true for all reference sizes: 512/16, 512/32,
    224/32, 256/16 …).

    method: None (auto: "pallas" single-compare quadrant kernel on TPU when
    tile sides are even, else "gather") — all paths agree to <1e-4 grey
    level (golden-tested against cv2)."""
    b, h, w = x8.shape
    gh, gw = grid
    if h % gh or w % gw:
        raise ValueError(f"image {h}x{w} not divisible by CLAHE grid {grid}")
    th, tw = h // gh, w // gw
    if method is None:
        method = ("pallas" if _is_tpu() and th % 2 == 0 and tw % 2 == 0
                  else "gather")
    luts = _tile_cdfs(x8, grid, clip_limit,
                      method="onehot" if method in ("onehot", "pallas")
                      else None)
    if method in ("onehot", "pallas"):
        if th % 2 or tw % 2:
            raise ValueError(
                f"quadrant CLAHE needs even tile sides, got {th}x{tw}")
        if method == "pallas":
            return _interp_luts_pallas(x8, luts, grid)
        return _interp_luts_onehot(x8, luts, grid)
    return _interp_luts(x8, luts, grid)


@partial(jax.jit, static_argnames=("grid", "clip_limit", "method"))
def clahe_uint16(x: jnp.ndarray, clip_limit: float = 2.0,
                 grid: tuple[int, int] = (8, 8),
                 method: str | None = None) -> jnp.ndarray:
    """Range-preserving uint16 CLAHE round-trip (reference:
    src/data/quality_preprocessing.py:125-147).

    x: (B, H, W, 1) float on the uint16 scale. Flat images pass through.
    """
    b, h, w, _ = x.shape
    img = x[..., 0]
    flat = img.reshape(b, -1)
    lo = flat.min(axis=1).reshape(b, 1, 1)
    hi = flat.max(axis=1).reshape(b, 1, 1)
    span = hi - lo
    norm01 = (img - lo) / (span + 1e-8)
    x8 = jnp.floor(norm01 * 255.0)                             # uint8 cast truncates
    # cv2's CLAHE returns uint8 (saturate_cast ROUNDS the interpolated
    # LUT value); without this round the fractional residue is amplified
    # ×(span/255) ≈ ×257 on the way back to the uint16 scale
    eq = jnp.round(clahe_8bit(x8, clip_limit=clip_limit, grid=grid,
                              method=method))
    out = eq / 255.0 * span + lo
    out = jnp.clip(out, 0.0, 65535.0)
    out = jnp.where(span <= 0, img, out)                       # flat image → identity
    return jnp.floor(out)[..., None]                            # uint16 cast truncates
