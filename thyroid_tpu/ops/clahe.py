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


def _tile_hists(x8: jnp.ndarray, grid: tuple[int, int],
                method: str | None = None) -> jnp.ndarray:
    """Per-tile 256-bin histograms.

    x8: (B, H, W) float in [0, 255] (integer-valued bins).
    Returns hist: (B, gh, gw, 256) float counts.
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
    return hist


def _luts_from_hists(hist: jnp.ndarray, area: int,
                     clip_limit: float) -> jnp.ndarray:
    """Clipped-histogram CDF LUT chain: (B, gh, gw, 256) counts → LUTs.

    Clip + redistribute, integer-exact to cv2's clahe.cpp: the absolute clip
    limit is max(int(clipLimit·area/256), 1); every bin gains excess//256,
    and the residual is dropped +1 at a time on bins 0, step, 2·step, …
    with step = max(256//residual, 1).
    """
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


def _tile_cdfs(x8: jnp.ndarray, grid: tuple[int, int], clip_limit: float,
               method: str | None = None) -> jnp.ndarray:
    """Per-tile clipped-histogram CDF-based LUTs: (B, H, W) → (B, gh, gw, 256)."""
    h, w = x8.shape[1:]
    area = (h // grid[0]) * (w // grid[1])
    return _luts_from_hists(_tile_hists(x8, grid, method), area, clip_limit)


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
    expand = _expand_matrix(gw, w, t2w, tw)                # (gw, W)

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
    res = _bit_select_tree(tab, xi)                         # (t2h, 2W)
    o_ref[0] = (res[:, :w] * (1.0 - wy)
                + res[:, w:] * wy).astype(o_ref.dtype)


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


def _expand_matrix(gw: int, w: int, t2w: int, tw: int) -> jnp.ndarray:
    """Blend-folded lane-expansion matrix E[g, x] = (g==x0(x))·(1−wx(x)) +
    (g==x1(x))·wx(x) for cv2's clamped half-tile x-indexing."""
    xpos = jax.lax.broadcasted_iota(jnp.int32, (gw, w), 1)
    hx = xpos // t2w
    x0 = jnp.clip((hx - 1) // 2, 0, gw - 1)
    x1 = jnp.clip((hx - 1) // 2 + 1, 0, gw - 1)
    rx = (xpos % t2w).astype(jnp.float32) / tw
    wx = jnp.where(hx % 2 == 0, rx + 0.5, rx)
    g = jax.lax.broadcasted_iota(jnp.int32, (gw, w), 0)
    return jnp.where(g == x0, 1.0 - wx, 0.0) + jnp.where(g == x1, wx, 0.0)


def _bit_select_tree(tab: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """tab[xi] per lane via the chunked bit-select tree: 8 chunks of 32
    leaf rows collapse through 5 select levels on xi's low bits, then 3
    cross-chunk selects — 255 vector selects, live intermediates bounded
    to 16 arrays. Pure selection → exactly tab[xi].

    tab: (256, L); xi: (rows, L) int32 in [0, 255] → (rows, L)."""
    bits = [((xi >> j) & 1) == 1 for j in range(8)]
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
    return chunks[0]


def _dual_apply_blend(sel, x, ctop_ref, cbot_ref, ftop_ref, fbot_ref, *,
                      tile_c: tuple[int, int], tile_f: tuple[int, int],
                      n_h2f: int) -> jnp.ndarray:
    """Core of the dual-grid quadrant apply: one bit-select tree pass,
    per-image coarse/fine tab selection. sel: bool scalar for this image;
    x: (t2h_f, W) f32 pixels; c*/f*: (1, 1, gw, 256) raw LUT tile rows.
    Returns the blended equalised block (t2h_f, W) f32.
    """
    th_c, tw_c = tile_c
    th_f, tw_f = tile_f
    t2h_f, t2w_f = th_f // 2, tw_f // 2
    t2w_c = tw_c // 2
    w = x.shape[1]
    gw_c = ctop_ref.shape[2]
    gw_f = ftop_ref.shape[2]

    e_c = _expand_matrix(gw_c, w, t2w_c, tw_c)
    e_f = _expand_matrix(gw_f, w, t2w_f, tw_f)

    def blend(l_ref, e):
        return jax.lax.dot_general(
            l_ref[0, 0].astype(jnp.float32), e, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (256, W)

    top = jnp.where(sel, blend(ctop_ref, e_c), blend(ftop_ref, e_f))
    bot = jnp.where(sel, blend(cbot_ref, e_c), blend(fbot_ref, e_f))
    tab = jnp.concatenate([top, bot], axis=1)             # (256, 2W)

    # y-direction weights for both grids, selected per image. Fine rows
    # nest in coarse half-blocks: within-coarse-half-block row offset =
    # (hy_f % 2)·t2h_f + r.
    hy_f = pl.program_id(0) % n_h2f
    hy_c = hy_f // 2
    r = jax.lax.broadcasted_iota(jnp.int32, (t2h_f, 1), 0)
    ry_f = r.astype(jnp.float32) / th_f
    wy_f = jnp.where(hy_f % 2 == 0, ry_f + 0.5, ry_f)
    ry_c = ((hy_f % 2) * t2h_f + r).astype(jnp.float32) / th_c
    wy_c = jnp.where(hy_c % 2 == 0, ry_c + 0.5, ry_c)
    wy = jnp.where(sel, wy_c, wy_f)                       # (t2h_f, 1)

    xi = jnp.concatenate([x, x], axis=1).astype(jnp.int32)  # (t2h_f, 2W)
    res = _bit_select_tree(tab, xi)
    return res[:, :w] * (1.0 - wy) + res[:, w:] * wy


def _quadrant_apply_dual_kernel(sel_ref, x_ref, ctop_ref, cbot_ref,
                                ftop_ref, fbot_ref, o_ref, *,
                                tile_c: tuple[int, int],
                                tile_f: tuple[int, int], n_h2f: int):
    """One fine half-block ROW of the DUAL-grid quadrant LUT apply.

    Runs the expensive bit-select tree ONCE per pixel block, selecting
    per image between the coarse- and fine-grid blended LUT tabs (the
    quality pipeline's dark/low-contrast branches are exclusive, so each
    image needs exactly one of the two) — instead of one full-batch apply
    pass per parameterisation. The fine half-block rows nest inside
    coarse half-blocks (t2h_c = 2·t2h_f), so both grids' neighbour LUT
    rows arrive via static BlockSpec index maps of the same grid step.

    sel_ref: (B,) int32 scalar-prefetch — 1 where the image takes the
    coarse grid; x_ref: (1, t2h_f, W); c*/f*: (1, 1, gw, 256) raw LUT
    tile rows.
    """
    sel = sel_ref[pl.program_id(0) // n_h2f] > 0
    res = _dual_apply_blend(
        sel, x_ref[0].astype(jnp.float32), ctop_ref, cbot_ref, ftop_ref,
        fbot_ref, tile_c=tile_c, tile_f=tile_f, n_h2f=n_h2f)
    o_ref[0] = res.astype(o_ref.dtype)


def _quadrant_apply_dual_fused_kernel(
        sel_ref, apply_ref, lo_ref, span_ref, x_ref, orig_ref, ctop_ref,
        cbot_ref, ftop_ref, fbot_ref, o_ref, *, tile_c: tuple[int, int],
        tile_f: tuple[int, int], n_h2f: int):
    """Dual-grid quadrant apply with the uint16 round-trip EPILOGUE and the
    pipeline's branch select folded in (round 3, the "apply epilogue" lead).

    The unfused composition writes the 8-bit equalised frame to HBM, then a
    separate fusion rounds/rescales it to the uint16 range, and a third
    where-pass selects equalised vs untouched per image — three extra
    full-resolution HBM passes. Here the kernel finishes the job in VMEM:

        eq    = round(blend)                         (cv2 saturate_cast)
        out16 = floor(clip(eq/255·span + lo, 0, 65535))
        o     = apply & span>0 ? out16
              : apply & span<=0 ? floor(orig)        (flat-image identity)
              : orig                                 (untouched frame)

    apply_ref/lo_ref/span_ref: (B,) scalar-prefetch; orig_ref: the
    pre-normalisation uint16-scale rows (1, t2h_f, W) — equals the
    pipeline's pass-through frame where `apply` is off.

    Bit-parity note: the blend is rounded in f32 here, whereas the unfused
    composition casts the dual-apply output to x8's dtype before rounding
    (_uint16_roundtrip). Parity with the composition therefore holds for
    f32 inputs — the only dtype the pipeline and tests use.
    """
    i = pl.program_id(0) // n_h2f
    sel = sel_ref[i] > 0
    res = _dual_apply_blend(
        sel, x_ref[0].astype(jnp.float32), ctop_ref, cbot_ref, ftop_ref,
        fbot_ref, tile_c=tile_c, tile_f=tile_f, n_h2f=n_h2f)
    eq = jnp.round(res)
    lo = lo_ref[i]
    span = span_ref[i]
    out16 = jnp.clip(eq / 255.0 * span + lo, 0.0, 65535.0)
    orig = orig_ref[0].astype(jnp.float32)
    take = (apply_ref[i] > 0) & (span > 0.0)
    flatpass = (apply_ref[i] > 0) & (span <= 0.0)
    out = jnp.where(take, jnp.floor(out16),
                    jnp.where(flatpass, jnp.floor(orig), orig))
    o_ref[0] = out.astype(o_ref.dtype)


def _interp_luts_pallas_dual(x8: jnp.ndarray, luts_c: jnp.ndarray,
                             luts_f: jnp.ndarray, use_coarse: jnp.ndarray,
                             grid_c: tuple[int, int], grid_f: tuple[int, int],
                             interpret: bool | None = None) -> jnp.ndarray:
    """Pallas dual-grid quadrant LUT apply: one tree pass for both grids."""
    if interpret is None:
        interpret = not _is_tpu()
    b, h, w = x8.shape
    gch, gcw = grid_c
    gfh, gfw = grid_f
    th_c, tw_c = h // gch, w // gcw
    th_f, tw_f = h // gfh, w // gfw
    t2h_f = th_f // 2
    H2f = 2 * gfh

    # the per-image selector rides scalar prefetch (SMEM); index maps take
    # the prefetch ref as an extra trailing arg
    def top_f_map(i, sel_ref):
        hy = i % H2f
        return (i // H2f, jnp.clip((hy - 1) // 2, 0, gfh - 1), 0, 0)

    def bot_f_map(i, sel_ref):
        hy = i % H2f
        return (i // H2f, jnp.clip((hy - 1) // 2 + 1, 0, gfh - 1), 0, 0)

    def top_c_map(i, sel_ref):
        hy = (i % H2f) // 2
        return (i // H2f, jnp.clip((hy - 1) // 2, 0, gch - 1), 0, 0)

    def bot_c_map(i, sel_ref):
        hy = (i % H2f) // 2
        return (i // H2f, jnp.clip((hy - 1) // 2 + 1, 0, gch - 1), 0, 0)

    xrows = jnp.clip(x8, 0, 255).reshape(b * H2f, t2h_f, w)
    sel = use_coarse.astype(jnp.int32).reshape(b)
    kernel = partial(_quadrant_apply_dual_kernel, tile_c=(th_c, tw_c),
                     tile_f=(th_f, tw_f), n_h2f=H2f)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * H2f,),
            in_specs=[
                pl.BlockSpec((1, t2h_f, w), lambda i, s: (i, 0, 0)),
                pl.BlockSpec((1, 1, gcw, 256), top_c_map),
                pl.BlockSpec((1, 1, gcw, 256), bot_c_map),
                pl.BlockSpec((1, 1, gfw, 256), top_f_map),
                pl.BlockSpec((1, 1, gfw, 256), bot_f_map),
            ],
            out_specs=pl.BlockSpec((1, t2h_f, w), lambda i, s: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b * H2f, t2h_f, w), x8.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(sel, xrows, luts_c.reshape(b, gch, gcw, 256),
      luts_c.reshape(b, gch, gcw, 256), luts_f.reshape(b, gfh, gfw, 256),
      luts_f.reshape(b, gfh, gfw, 256))
    return out.reshape(b, h, w)


def _interp_luts_pallas_dual_fused(
        x8: jnp.ndarray, orig: jnp.ndarray, luts_c: jnp.ndarray,
        luts_f: jnp.ndarray, use_coarse: jnp.ndarray, apply: jnp.ndarray,
        lo: jnp.ndarray, span: jnp.ndarray, grid_c: tuple[int, int],
        grid_f: tuple[int, int], interpret: bool | None = None) -> jnp.ndarray:
    """Dual-grid quadrant apply + in-kernel uint16 round-trip epilogue.

    Returns the FINAL uint16-scale frame: equalised where `apply`, the
    untouched `orig` rows elsewhere — no post-kernel full-resolution pass.
    """
    if interpret is None:
        interpret = not _is_tpu()
    b, h, w = x8.shape
    gch, gcw = grid_c
    gfh, gfw = grid_f
    th_c, tw_c = h // gch, w // gcw
    th_f, tw_f = h // gfh, w // gfw
    t2h_f = th_f // 2
    H2f = 2 * gfh

    def top_f_map(i, *refs):
        hy = i % H2f
        return (i // H2f, jnp.clip((hy - 1) // 2, 0, gfh - 1), 0, 0)

    def bot_f_map(i, *refs):
        hy = i % H2f
        return (i // H2f, jnp.clip((hy - 1) // 2 + 1, 0, gfh - 1), 0, 0)

    def top_c_map(i, *refs):
        hy = (i % H2f) // 2
        return (i // H2f, jnp.clip((hy - 1) // 2, 0, gch - 1), 0, 0)

    def bot_c_map(i, *refs):
        hy = (i % H2f) // 2
        return (i // H2f, jnp.clip((hy - 1) // 2 + 1, 0, gch - 1), 0, 0)

    def row_map(i, *refs):
        return (i, 0, 0)

    xrows = jnp.clip(x8, 0, 255).reshape(b * H2f, t2h_f, w)
    orows = orig.reshape(b * H2f, t2h_f, w)
    kernel = partial(_quadrant_apply_dual_fused_kernel, tile_c=(th_c, tw_c),
                     tile_f=(th_f, tw_f), n_h2f=H2f)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(b * H2f,),
            in_specs=[
                pl.BlockSpec((1, t2h_f, w), row_map),
                pl.BlockSpec((1, t2h_f, w), row_map),
                pl.BlockSpec((1, 1, gcw, 256), top_c_map),
                pl.BlockSpec((1, 1, gcw, 256), bot_c_map),
                pl.BlockSpec((1, 1, gfw, 256), top_f_map),
                pl.BlockSpec((1, 1, gfw, 256), bot_f_map),
            ],
            out_specs=pl.BlockSpec((1, t2h_f, w), row_map),
        ),
        out_shape=jax.ShapeDtypeStruct((b * H2f, t2h_f, w), orig.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(use_coarse.astype(jnp.int32).reshape(b),
      apply.astype(jnp.int32).reshape(b),
      lo.astype(jnp.float32).reshape(b), span.astype(jnp.float32).reshape(b),
      xrows, orows, luts_c.reshape(b, gch, gcw, 256),
      luts_c.reshape(b, gch, gcw, 256), luts_f.reshape(b, gfh, gfw, 256),
      luts_f.reshape(b, gfh, gfw, 256))
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
        method = _auto_method(th, tw)
    luts = _tile_cdfs(x8, grid, clip_limit,
                      method="onehot" if method in ("onehot", "pallas")
                      else None)
    if method in ("onehot", "pallas") and (th % 2 or tw % 2):
        raise ValueError(
            f"quadrant CLAHE needs even tile sides, got {th}x{tw}")
    return _apply_luts(x8, luts, grid, method)


def _uint16_roundtrip(x: jnp.ndarray, eq_fn) -> jnp.ndarray:
    """Range-preserving uint16 round-trip shared by the single- and
    dual-parameterisation entries (reference:
    src/data/quality_preprocessing.py:125-147): per-image [min, max] → 8-bit
    → `eq_fn` → back. Flat images pass through.

    x: (B, H, W, 1) float on the uint16 scale;
    eq_fn: integer-valued (B, H, W) bins in [0, 255] → equalised (B, H, W).
    """
    b = x.shape[0]
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
    eq = jnp.round(eq_fn(x8))
    out = eq / 255.0 * span + lo
    out = jnp.clip(out, 0.0, 65535.0)
    out = jnp.where(span <= 0, img, out)                       # flat image → identity
    return jnp.floor(out)[..., None]                            # uint16 cast truncates


@partial(jax.jit, static_argnames=("grid", "clip_limit", "method"))
def clahe_uint16(x: jnp.ndarray, clip_limit: float = 2.0,
                 grid: tuple[int, int] = (8, 8),
                 method: str | None = None) -> jnp.ndarray:
    """Range-preserving uint16 CLAHE round-trip (reference:
    src/data/quality_preprocessing.py:125-147).

    x: (B, H, W, 1) float on the uint16 scale. Flat images pass through.
    """
    return _uint16_roundtrip(
        x, lambda x8: clahe_8bit(x8, clip_limit=clip_limit, grid=grid,
                                 method=method))


def _apply_luts(x8: jnp.ndarray, luts: jnp.ndarray, grid: tuple[int, int],
                method: str) -> jnp.ndarray:
    if method == "pallas":
        return _interp_luts_pallas(x8, luts, grid)
    if method == "onehot":
        return _interp_luts_onehot(x8, luts, grid)
    return _interp_luts(x8, luts, grid)


def _auto_method(th: int, tw: int) -> str:
    return ("pallas" if _is_tpu() and th % 2 == 0 and tw % 2 == 0
            else "gather")


def _dual_luts(x8: jnp.ndarray, clip_coarse: float,
               grid_coarse: tuple[int, int], clip_fine: float,
               grid_fine: tuple[int, int]) -> tuple[jnp.ndarray, jnp.ndarray]:
    """ONE fine-grid histogram pass feeding both LUT chains (the coarse
    tile histograms are exact 2×2 sums of the fine ones — same pixels,
    integer-valued f32 counts, so the sum is associative-exact)."""
    b, h, w = x8.shape
    gch, gcw = grid_coarse
    gfh, gfw = grid_fine
    area_f = (h // gfh) * (w // gfw)
    area_c = area_f * 4

    hist_f = _tile_hists(x8, grid_fine,
                         method="onehot" if _is_tpu() else None)
    hist_c = hist_f.reshape(b, gch, 2, gcw, 2, 256).sum(axis=(2, 4))
    luts_c = _luts_from_hists(hist_c, area_c, clip_coarse)
    luts_f = _luts_from_hists(hist_f, area_f, clip_fine)
    return luts_c, luts_f


@partial(jax.jit, static_argnames=("clip_coarse", "grid_coarse", "clip_fine",
                                   "grid_fine", "method"))
def clahe_8bit_dual(
    x8: jnp.ndarray,
    use_coarse: jnp.ndarray,
    clip_coarse: float,
    grid_coarse: tuple[int, int],
    clip_fine: float,
    grid_fine: tuple[int, int],
    method: str | None = None,
) -> jnp.ndarray:
    """Per-image select between TWO CLAHE parameterisations with ONE
    histogram pass.

    The quality pipeline's dark/low-contrast branches are per-image
    exclusive (reference: src/data/quality_preprocessing.py:199-216 —
    `if extreme_dark … elif low_contrast`), yet the batched formulation
    used to run BOTH full CLAHE passes over every image. When the two
    grids nest (grid_fine = 2×grid_coarse componentwise — true for the
    reference's (16,16)/(32,32) table), the coarse tile histograms are
    EXACTLY the 2×2 sums of the fine tile histograms (same pixels,
    integer-valued f32 counts, so the sum is associative-exact), so one
    compare-reduce histogram pass serves both LUT chains.

    x8: (B, H, W) integer-valued floats in [0, 255];
    use_coarse: (B,) bool — image takes the coarse parameterisation.
    Returns the equalised (B, H, W), per-image identical to running
    `clahe_8bit` with that image's parameterisation alone.
    """
    b, h, w = x8.shape
    gch, gcw = grid_coarse
    gfh, gfw = grid_fine
    if (gfh, gfw) != (2 * gch, 2 * gcw):
        raise ValueError(
            f"dual CLAHE needs grid_fine == 2*grid_coarse, got "
            f"{grid_coarse} vs {grid_fine}")
    if h % gfh or w % gfw:
        raise ValueError(f"image {h}x{w} not divisible by CLAHE grid {grid_fine}")
    luts_c, luts_f = _dual_luts(x8, clip_coarse, grid_coarse, clip_fine,
                                grid_fine)

    # NOTE: ONE method serves both branches (the dual kernel is a single
    # program). The per-image identity with standalone `clahe_8bit` holds
    # for the same method; when the grids' auto-picks would differ (odd
    # fine tile, even coarse tile on TPU), callers wanting bit-identity
    # with the auto single-pass path must not merge — quality_preprocess
    # gates on exactly this.
    if method is None:
        method = _auto_method(h // gfh, w // gfw)
    if method in ("onehot", "pallas") and ((h // gfh) % 2 or (w // gfw) % 2):
        raise ValueError(
            f"quadrant CLAHE needs even tile sides, got "
            f"{h // gfh}x{w // gfw}")
    if method == "pallas":
        # one tree pass, per-image coarse/fine tab selection in-kernel
        return _interp_luts_pallas_dual(
            jnp.clip(x8, 0, 255), luts_c, luts_f, use_coarse,
            grid_coarse, grid_fine)
    out_c = _apply_luts(x8, luts_c, grid_coarse, method)
    out_f = _apply_luts(x8, luts_f, grid_fine, method)
    return jnp.where(use_coarse.reshape(b, 1, 1), out_c, out_f)


@partial(jax.jit, static_argnames=("clip_coarse", "grid_coarse", "clip_fine",
                                   "grid_fine", "method"))
def clahe_uint16_dual(
    x: jnp.ndarray,
    use_coarse: jnp.ndarray,
    clip_coarse: float,
    grid_coarse: tuple[int, int],
    clip_fine: float,
    grid_fine: tuple[int, int],
    method: str | None = None,
) -> jnp.ndarray:
    """Range-preserving uint16 round-trip over `clahe_8bit_dual`: ONE
    min/max normalisation + denormalisation pass instead of one per
    parameterisation. Per-image bit-identical to `clahe_uint16` with that
    image's own parameterisation (the round-trip is per-image math).

    x: (B, H, W, 1) float on the uint16 scale; use_coarse: (B,) bool.
    """
    return _uint16_roundtrip(
        x, lambda x8: clahe_8bit_dual(
            x8, use_coarse, clip_coarse, grid_coarse, clip_fine, grid_fine,
            method=method))


@partial(jax.jit, static_argnames=("clip_coarse", "grid_coarse", "clip_fine",
                                   "grid_fine", "method"))
def clahe_uint16_dual_fused(
    x: jnp.ndarray,
    use_coarse: jnp.ndarray,
    apply: jnp.ndarray,
    clip_coarse: float,
    grid_coarse: tuple[int, int],
    clip_fine: float,
    grid_fine: tuple[int, int],
    method: str | None = None,
) -> jnp.ndarray:
    """Dual-grid uint16 CLAHE with the round-trip epilogue AND the
    pipeline's per-image branch select fused into the apply kernel.

    Equivalent to

        eq = clahe_uint16_dual(x, use_coarse, ...)
        where(apply[:, None, None, None], eq, x)

    but on TPU (method="pallas") the denormalisation (÷255·span+lo, clip,
    floor) and the apply/pass-through select happen in the kernel's VMEM
    epilogue, eliminating the equalised frame's HBM round-trip and the
    separate full-resolution where-pass (reference semantics:
    src/data/quality_preprocessing.py:125-147 + the exclusive branch
    dispatch at :199-216).

    x: (B, H, W, 1) float on the uint16 scale; use_coarse/apply: (B,) bool.
    """
    b, h, w = x.shape[0], x.shape[1], x.shape[2]
    gch, gcw = grid_coarse
    gfh, gfw = grid_fine
    if (gfh, gfw) != (2 * gch, 2 * gcw):
        raise ValueError(
            f"dual CLAHE needs grid_fine == 2*grid_coarse, got "
            f"{grid_coarse} vs {grid_fine}")
    if h % gfh or w % gfw:
        raise ValueError(
            f"image {h}x{w} not divisible by CLAHE grid {grid_fine}")
    if method is None:
        method = _auto_method(h // gfh, w // gfw)
    if method == "pallas" and ((h // gfh) % 2 or (w // gfw) % 2):
        # mirror clahe_8bit_dual's guard: the quadrant kernel's half-tile
        # indexing (t2w = tw//2) is silently wrong for odd fine tile widths
        raise ValueError(
            f"quadrant CLAHE needs even tile sides, got "
            f"{h // gfh}x{w // gfw}")
    if method != "pallas":
        eq = clahe_uint16_dual(
            x, use_coarse, clip_coarse=clip_coarse, grid_coarse=grid_coarse,
            clip_fine=clip_fine, grid_fine=grid_fine, method=method)
        return jnp.where(apply.reshape(b, 1, 1, 1), eq, x)

    # identical normalisation math to _uint16_roundtrip (bit-parity)
    img = x[..., 0]
    flat = img.reshape(b, -1)
    lo = flat.min(axis=1).reshape(b, 1, 1)
    hi = flat.max(axis=1).reshape(b, 1, 1)
    span = hi - lo
    norm01 = (img - lo) / (span + 1e-8)
    x8 = jnp.floor(norm01 * 255.0)
    luts_c, luts_f = _dual_luts(x8, clip_coarse, grid_coarse, clip_fine,
                                grid_fine)
    out = _interp_luts_pallas_dual_fused(
        x8, img, luts_c, luts_f, use_coarse, apply, lo.reshape(b),
        span.reshape(b), grid_coarse, grid_fine)
    return out[..., None]
