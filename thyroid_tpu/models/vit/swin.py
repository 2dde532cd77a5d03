"""Swin Transformer with medical adaptations (from scratch, flax).

Rebuilds the reference's Swin stack (reference: src/models/vit/swin_transformer.py):
- window partition/reverse (:21-54) — pure reshapes here (XLA fuses them)
- MedicalWindowAttention (:57-184): relative position bias, contrast-adaptive
  per-head scaling (:116-117,168-169), quality-gated output (:119-125,177-179)
- SwinTransformerBlock with cyclic shift + static attention masks (:187-321)
- PatchMerging with quality-weighted 4-way merge (:324-396). NOTE the
  reference's quality branch is defective (applies a 4C LayerNorm to C-dim
  features and collapses the channel dim, breaking stage widths); here the
  intent is kept with correct shapes: softmax quality weights modulate the 4
  neighbours before the 4C→2C reduction.
- stages with optional gradient checkpointing (:467-470 — jax.remat here)
- uncertainty head for medical_adaptations (:588-593)

Shift masks and relative-position indices are compile-time constants
(numpy), so the whole network is static-shaped and fully fusible.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..layers import (LN_EPS, DenseParams, DropPath, LNParams, MlpParams,
                      trunc_normal_init)
from ..registry import ModelRegistry, cfg_get, resolve_dtype

Dtype = Any


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) → (B·nW, ws·ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """(B·nW, ws·ws, C) → (B, H, W, C)."""
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


@lru_cache(maxsize=None)
def relative_position_index(ws: int) -> np.ndarray:
    """(ws², ws²) index into the (2ws−1)² bias table (standard Swin scheme,
    reference :95-107)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


@lru_cache(maxsize=None)
def shift_attention_mask(h: int, w: int, ws: int, shift: int) -> Optional[np.ndarray]:
    """(nW, ws², ws²) additive mask (0 / −100) for shifted windows
    (reference :301-321). None when shift == 0."""
    if shift == 0:
        return None
    img_mask = np.zeros((1, h, w, 1))
    h_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    w_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    cnt = 0
    for hs in h_slices:
        for wsl in w_slices:
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1
    mask_windows = img_mask.reshape(1, h // ws, ws, w // ws, ws, 1)
    mask_windows = mask_windows.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


# param-shim modules shared with the plain-ViT stack (models/layers.py):
# create nn.LayerNorm/nn.Dense/Mlp-identical param trees, expose params raw
# for the fused serving kernels.
_LNParams = LNParams
_DenseParams = DenseParams
_MlpParams = MlpParams


def manual_layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                      dtype: Dtype, eps: float = LN_EPS) -> jnp.ndarray:
    """flax nn.LayerNorm numerics (fast variance, f32 stats, same op order)
    computed from raw params — the XLA-side counterpart of the fused
    kernel's in-VMEM LN."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = jnp.maximum(0.0, (xf * xf).mean(axis=-1, keepdims=True) - mu * mu)
    mul = jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    y = (xf - mu) * mul + bias.astype(jnp.float32)
    return y.astype(dtype)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias + medical adaptations."""

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop_rate: float = 0.0
    proj_drop_rate: float = 0.0
    contrast_adaptive: bool = False
    quality_guided: bool = False
    use_pallas: bool = False
    train_token_kernels: bool = False
    # LN+QKV-fusing kernel variant: MEASURED SLOWER than the qkv-input
    # kernel on v5e (1.9k vs 3.1k img/s swin_tiny end-to-end) — the (1, C)
    # trailing-dim input tiles each (1, 96) row into an (8, 128) VMEM tile
    # (~8× DMA bloat) and the per-window (N, C)·(C, C) matmuls are too small
    # for the MXU. Kept for the record + unit tests; off by default.
    ln_kernel: bool = False
    softmax_dtype: Dtype = jnp.float32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True, capture: bool = False,
                 spatial: bool = False,
                 ln: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                 fuse_residual: bool = False) -> jnp.ndarray:
        ws = self.window_size
        c = x.shape[-1]
        head_dim = c // self.num_heads
        scale = self.qk_scale or head_dim ** -0.5

        qkv_kernel, qkv_b = _DenseParams(c, 3 * c, self.qkv_bias,
                                         name="qkv")()

        def qkv_apply(t):
            # nn.Dense(dtype=self.dtype) numerics from the raw params
            y = t.astype(self.dtype) @ qkv_kernel.astype(self.dtype)
            if qkv_b is not None:
                y = y + qkv_b.astype(self.dtype)
            return y

        table = self.param("relative_position_bias_table", trunc_normal_init,
                           ((2 * ws - 1) ** 2, self.num_heads))
        idx = relative_position_index(ws)
        n = ws * ws
        bias_nnh = table[idx.reshape(-1)].reshape(n, n, self.num_heads)

        if spatial:
            # Fused Pallas paths (round 2): x is the PRE-ROLLED spatial map
            # (B, H, W, C). Serving (deterministic, ln given): LN+QKV via
            # the token-2D kernel, then window partition + W-MSA + reverse
            # + out-proj + residual in ONE attention kernel
            # (fused_swin_block_attention). Training: LN+QKV in XLA,
            # attention through the custom_vjp qkv-input kernel. The
            # all-in-one LN+QKV+W-MSA kernel (fused_swin_ln_attention) is a
            # measured negative result, kept opt-in via ln_kernel.
            from ...ops.attention import (fused_swin_attention,
                                          fused_swin_ln_attention)

            b, hh, ww_ = x.shape[:3]
            bias_hnn = bias_nnh.transpose(2, 0, 1).astype(jnp.float32)
            if self.ln_kernel and ln is not None and deterministic:
                out = fused_swin_ln_attention(
                    x, ln[0], ln[1], qkv_kernel, qkv_b, bias_hnn, mask=mask,
                    window_size=ws, num_heads=self.num_heads,
                    scale=scale).astype(self.dtype)
            else:
                if ln is not None and deterministic:
                    # serving: LN fused into the QKV matmul's VMEM pass
                    # (token-2D kernel, ops/token_fused.py) — kills the
                    # standalone XLA LayerNorm fusion on the stream
                    from ...ops.token_fused import fused_ln_matmul

                    qkv = fused_ln_matmul(x, ln[0], ln[1], qkv_kernel,
                                          qkv_b).reshape(b, hh, ww_, 3, c)
                    if fuse_residual and not self.quality_guided:
                        # serving: out-proj + residual as the attention
                        # kernel's epilogue — returns the half-block's
                        # residual STREAM x + proj(attn), not the raw
                        # attention output (ops/attention.py
                        # fused_swin_block_attention; dropout/DropPath are
                        # identities at eval, so this is exact)
                        from ...ops.attention import fused_swin_block_attention

                        wp, bp = _DenseParams(c, c, True, name="proj")()
                        return fused_swin_block_attention(
                            qkv, x, wp, bp, bias_hnn, mask=mask,
                            window_size=ws, num_heads=self.num_heads,
                            scale=scale).astype(self.dtype)
                elif self.train_token_kernels and ln is not None:
                    # OPT-IN training variant: the same LN+QKV kernel via
                    # its custom_vjp (backward recomputes LN stats in VMEM).
                    # MEASURED 3% SLOWER than XLA on v5e swin_tiny B=128
                    # (1153 vs 1187 img/s) — the thin C=96 contraction
                    # underfills the MXU and the bwd re-reads x/dy that
                    # XLA's fused LN-bwd chain already has in registers.
                    # Kept for parity testing and larger-C models.
                    from ...ops.token_fused import fused_ln_matmul

                    qkv = fused_ln_matmul(
                        x.astype(self.dtype), ln[0], ln[1], qkv_kernel,
                        qkv_b).reshape(b, hh, ww_, 3, c)
                else:
                    xn = manual_layer_norm(x, ln[0], ln[1], self.dtype) \
                        if ln is not None else x
                    qkv = qkv_apply(xn).reshape(b, hh, ww_, 3, c)
                out = fused_swin_attention(
                    qkv, bias_hnn, mask=mask, window_size=ws,
                    num_heads=self.num_heads,
                    scale=scale).astype(self.dtype)
            return self._output_proj(out, deterministic)

        b_, n, c = x.shape
        qkv = qkv_apply(x)
        qkv = qkv.reshape(b_, n, 3, self.num_heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        q = q.transpose(0, 2, 1, 3)                             # (B_, h, n, hd)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        q = q * scale
        # softmax_dtype=bf16 halves HBM traffic on the (BW,h,N,N) attention
        # tensor — an inference fast path; training keeps f32 for stability.
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=self.softmax_dtype)
        attn = attn + bias_nnh.transpose(2, 0, 1)[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(b_, self.num_heads, n, n)

        if self.contrast_adaptive:
            cs = self.param("contrast_scale", nn.initializers.ones,
                            (self.num_heads,))
            attn = attn * cs.reshape(1, -1, 1, 1)

        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        if capture:
            self.sow("intermediates", "attention", attn)
        attn = nn.Dropout(self.attn_drop_rate)(attn, deterministic=deterministic)

        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return self._output_proj(out, deterministic)

    def _output_proj(self, out: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        c = out.shape[-1]
        if self.quality_guided:
            g = nn.Dense(c // 4, dtype=self.dtype, name="quality_gate_1")(out)
            g = nn.relu(g)
            g = nn.Dense(1, dtype=self.dtype, name="quality_gate_2")(g)
            out = out * nn.sigmoid(g)

        out = nn.Dense(c, dtype=self.dtype, kernel_init=trunc_normal_init,
                       name="proj")(out)
        out = nn.Dropout(self.proj_drop_rate)(out, deterministic=deterministic)
        return out


class SwinBlock(nn.Module):
    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    contrast_adaptive: bool = False
    quality_guided: bool = False
    use_pallas: bool = False
    train_token_kernels: bool = False
    softmax_dtype: Dtype = jnp.float32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 capture: bool = False) -> jnp.ndarray:
        h, w = self.input_resolution
        b, l, c = x.shape
        ws, shift = self.window_size, self.shift_size
        if min(h, w) <= ws:                 # window covers the map → no shift
            ws, shift = min(h, w), 0

        # Pad feature maps to window multiples (reference
        # swin_transformer.py:256-262 — right/bottom zero-pad AFTER norm1,
        # masked only through the shifted-window mask, sliced off after).
        pad_b = (-h) % ws
        pad_r = (-w) % ws
        hp, wp = h + pad_b, w + pad_r
        padded = pad_b > 0 or pad_r > 0

        shortcut = x
        # norm1 params only — the fused serving kernel computes LN in VMEM;
        # the other paths apply the identical math via manual_layer_norm.
        g_ln, b_ln = _LNParams(c, name="norm1")()
        x = x.reshape(b, h, w, c)
        if padded:
            # LN first so the pad tokens are exact zeros post-norm, as in
            # the reference (roll commutes with per-token LN, so the
            # unpadded path may keep its roll-then-LN order unchanged).
            x = manual_layer_norm(x, g_ln, b_ln, self.dtype)
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        if shift > 0:
            x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))

        mask = shift_attention_mask(hp, wp, ws, shift)
        mask = jnp.asarray(mask) if mask is not None else None
        attn = WindowAttention(
            self.dim, ws, self.num_heads, self.qkv_bias, self.qk_scale,
            self.attn_drop_rate, self.drop_rate,
            contrast_adaptive=self.contrast_adaptive,
            quality_guided=self.quality_guided,
            use_pallas=self.use_pallas,
            train_token_kernels=self.train_token_kernels,
            softmax_dtype=self.softmax_dtype,
            dtype=self.dtype, name="attn",
        )
        # Fused spatial kernel — train AND eval (custom_vjp backward kernel,
        # ops/attention.py). Excluded: attention-matrix capture, per-head
        # contrast scaling (score edit between bias and softmax), and
        # training with attention dropout (the kernel has none).
        fused = self.use_pallas and not capture \
            and not self.contrast_adaptive and not padded \
            and (deterministic or self.attn_drop_rate == 0.0)
        # serving: proj + residual ride the attention kernel's epilogue, so
        # the attn call returns the half-block's residual stream directly
        # (must mirror WindowAttention's own fuse_residual predicate)
        proj_fused = fused and deterministic and not self.quality_guided
        if fused:
            x = attn(x, mask=mask, deterministic=deterministic, spatial=True,
                     ln=(g_ln, b_ln), fuse_residual=proj_fused)
        else:
            xn = x if padded else manual_layer_norm(x, g_ln, b_ln, self.dtype)
            windows = window_partition(xn, ws)
            windows = attn(windows, mask=mask, deterministic=deterministic,
                           capture=capture)
            x = window_reverse(windows, ws, hp, wp)
        if shift > 0:
            x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
        if padded:
            x = x[:, :h, :w]
        x = x.reshape(b, l, c)
        if not proj_fused:
            x = shortcut + DropPath(self.drop_path_rate)(
                x, deterministic=deterministic)

        g2, b2_ln = _LNParams(c, name="norm2")()
        w1, b1, w2, b2 = _MlpParams(c, int(c * self.mlp_ratio), name="mlp")()
        mlp_kernel = self.use_pallas and not capture
        if mlp_kernel and deterministic:
            # serving: norm2 + fc1 + gelu + fc2 + residual in ONE kernel —
            # the 4C hidden tensor never touches HBM (ops/token_fused.py).
            # Dropout/DropPath are identities at eval, so this is exact.
            from ...ops.token_fused import fused_ln_mlp_residual

            return fused_ln_mlp_residual(x, g2, b2_ln, w1, b1, w2, b2)
        if mlp_kernel and self.train_token_kernels and self.drop_rate == 0.0:
            # OPT-IN training variant: same kernel minus the residual
            # (custom_vjp backward recomputes LN + the 4C hidden in VMEM);
            # DropPath and the skip stay outside. MEASURED 11% SLOWER than
            # XLA on v5e swin_tiny B=128 (1031 vs 1187 img/s with both
            # token kernels on): the MLP is FLOP-bound at mlp_ratio 4 —
            # AI ≈ 76 flops/byte before any fusion — so the flash-style
            # double recompute (dX and dW kernels each rebuild h) costs
            # more than the hidden tensor's HBM round-trip it saves.
            # Negative result recorded in docs/DESIGN.md; default off.
            from ...ops.token_fused import fused_ln_mlp

            y = fused_ln_mlp(x, g2, b2_ln, w1, b1, w2, b2)
            return x + DropPath(self.drop_path_rate)(
                y, deterministic=deterministic)
        y = manual_layer_norm(x, g2, b2_ln, self.dtype)
        # Mlp numerics from the raw params (nn.Dense promotion + exact gelu)
        y = y.astype(self.dtype) @ w1.astype(self.dtype) \
            + b1.astype(self.dtype)
        y = nn.gelu(y, approximate=False)
        y = nn.Dropout(self.drop_rate)(y, deterministic=deterministic)
        y = y @ w2.astype(self.dtype) + b2.astype(self.dtype)
        y = nn.Dropout(self.drop_rate)(y, deterministic=deterministic)
        return x + DropPath(self.drop_path_rate)(y, deterministic=deterministic)


class PatchMerging(nn.Module):
    """2×2 patch merge, 4C→2C, with optional quality-weighted neighbour mix
    (reference :324-396; shape defect fixed — see module docstring above)."""

    input_resolution: Tuple[int, int]
    dim: int
    quality_aware: bool = False
    use_pallas: bool | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        h, w = self.input_resolution
        b, l, c = x.shape
        x = x.reshape(b, h, w, c)
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        merged = jnp.concatenate([x0, x1, x2, x3], axis=-1)     # (B,h/2,w/2,4C)
        merged = merged.reshape(b, -1, 4 * c)
        if self.quality_aware:
            qw = nn.Dense(c, dtype=self.dtype, name="quality_weight_1")(merged)
            qw = nn.relu(qw)
            qw = nn.Dense(4, dtype=self.dtype, name="quality_weight_2")(qw)
            qw = jax.nn.softmax(qw, axis=-1)                     # (B,N,4)
            comp = merged.reshape(b, -1, 4, c)
            comp = comp * (4.0 * qw[..., None])                  # keep scale
            merged = comp.reshape(b, -1, 4 * c)
        # raw norm/reduction params (same tree as nn.LayerNorm + nn.Dense,
        # so checkpoints and the timm importer are unaffected) — the serving
        # path fuses LN into the reduction matmul's VMEM pass exactly like
        # the block's LN+QKV (ops/token_fused.py), saving the 4C stream's
        # extra HBM round-trip between norm and reduction
        g_ln, b_ln = _LNParams(4 * c, name="norm")()
        red_kernel, _ = _DenseParams(4 * c, 2 * c, False, name="reduction")()
        use_kernel = self.use_pallas
        if use_kernel is None:
            from ...ops.tpu_platform import is_tpu

            use_kernel = is_tpu()
        if use_kernel and deterministic:
            from ...ops.token_fused import fused_ln_matmul

            return fused_ln_matmul(
                merged.astype(self.dtype), g_ln, b_ln, red_kernel,
                None).astype(self.dtype)
        normed = manual_layer_norm(merged, g_ln, b_ln, self.dtype)
        return normed @ red_kernel.astype(self.dtype)


class SwinStage(nn.Module):
    dim: int
    input_resolution: Tuple[int, int]
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    qkv_bias: bool
    qk_scale: Optional[float]
    drop_rate: float
    attn_drop_rate: float
    drop_path_rates: Sequence[float]
    downsample: bool
    contrast_adaptive: bool = False
    quality_guided: bool = False
    quality_aware_merge: bool = False
    use_pallas: bool = False
    train_token_kernels: bool = False
    softmax_dtype: Dtype = jnp.float32
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 capture: bool = False) -> jnp.ndarray:
        block_cls = SwinBlock
        if self.remat:
            block_cls = nn.remat(SwinBlock, static_argnums=(2, 3))
        for i in range(self.depth):
            x = block_cls(
                self.dim, self.input_resolution, self.num_heads,
                self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale, drop_rate=self.drop_rate,
                attn_drop_rate=self.attn_drop_rate,
                drop_path_rate=float(self.drop_path_rates[i]),
                contrast_adaptive=self.contrast_adaptive,
                quality_guided=self.quality_guided,
                use_pallas=self.use_pallas,
                train_token_kernels=self.train_token_kernels,
                softmax_dtype=self.softmax_dtype,
                dtype=self.dtype, name=f"block_{i}",
            )(x, deterministic, capture)
        if capture:
            self.sow("intermediates", "stage_features", x)
        if self.downsample:
            x = PatchMerging(self.input_resolution, self.dim,
                             quality_aware=self.quality_aware_merge,
                             use_pallas=self.use_pallas,
                             dtype=self.dtype, name="downsample")(
                                 x, deterministic)
        return x


class SwinTransformer(nn.Module):
    img_size: int = 224
    patch_size: int = 4
    in_channels: int = 1
    num_classes: int = 2
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    ape: bool = False
    patch_norm: bool = True
    medical_adaptations: bool = False
    contrast_adaptive: bool = False
    quality_guided: bool = False
    uncertainty_head: bool = False
    use_pallas_attention: bool = False
    train_token_kernels: bool = False
    softmax_dtype: Dtype = jnp.float32
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 capture: bool = False, return_uncertainty: bool = False):
        det = not train
        b = x.shape[0]
        p = self.patch_size
        res = self.img_size // p
        x = nn.Conv(self.embed_dim, kernel_size=(p, p), strides=(p, p),
                    dtype=self.dtype, kernel_init=trunc_normal_init,
                    name="patch_embed")(x)
        x = x.reshape(b, res * res, self.embed_dim)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="patch_norm")(x)
        if self.ape:
            pe = self.param("absolute_pos_embed", trunc_normal_init,
                            (1, res * res, self.embed_dim))
            x = x + pe.astype(x.dtype)
        x = nn.Dropout(self.drop_rate)(x, deterministic=det)

        num_layers = len(self.depths)
        dpr = np.linspace(0.0, self.drop_path_rate, sum(self.depths))
        ca = self.contrast_adaptive or self.medical_adaptations
        qg = self.quality_guided or self.medical_adaptations
        for i in range(num_layers):
            start = sum(self.depths[:i])
            x = SwinStage(
                dim=int(self.embed_dim * 2 ** i),
                input_resolution=(res // 2 ** i, res // 2 ** i),
                depth=self.depths[i],
                num_heads=self.num_heads[i],
                window_size=self.window_size,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                drop_rate=self.drop_rate,
                attn_drop_rate=self.attn_drop_rate,
                drop_path_rates=tuple(float(r) for r in dpr[start:start + self.depths[i]]),
                downsample=i < num_layers - 1,
                contrast_adaptive=ca,
                quality_guided=qg,
                quality_aware_merge=self.medical_adaptations,
                use_pallas=self.use_pallas_attention,
                train_token_kernels=self.train_token_kernels,
                softmax_dtype=self.softmax_dtype,
                remat=self.remat,
                dtype=self.dtype,
                name=f"stage_{i}",
            )(x, deterministic=det, capture=capture)

        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)
        if capture:
            self.sow("intermediates", "final_tokens", x)
        feat = x.mean(axis=1)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          kernel_init=trunc_normal_init, name="head")(feat)
        if self.medical_adaptations or self.uncertainty_head:
            u = nn.Dense(feat.shape[-1] // 2, dtype=self.dtype,
                         name="uncertainty_1")(feat)
            u = nn.relu(u)
            u = nn.Dropout(0.1)(u, deterministic=det)
            u = nn.Dense(self.num_classes, dtype=jnp.float32,
                         name="uncertainty_2")(u)
            self.sow("intermediates", "uncertainty", u)
            if return_uncertainty:
                return logits, u
        return logits


SWIN_PARAMS = {
    # name: (embed_dim, depths, num_heads, drop_path, img_size)
    # reference: create_swin_* — swin_transformer.py:779-934
    "swin_tiny": (96, (2, 2, 6, 2), (3, 6, 12, 24), 0.2, 224),
    "swin_small": (96, (2, 2, 18, 2), (3, 6, 12, 24), 0.3, 224),
    "swin_base": (128, (2, 2, 18, 2), (4, 8, 16, 32), 0.5, 224),
    "swin_large": (192, (2, 2, 18, 2), (6, 12, 24, 48), 0.5, 224),
    "swin_medical": (96, (2, 2, 18, 2), (3, 6, 12, 24), 0.25, 256),
}


def build_swin(cfg: Any) -> SwinTransformer:
    name = cfg_get(cfg, "name", "swin_tiny")
    dim, depths, heads, dpr, img = SWIN_PARAMS.get(
        name, (96, (2, 2, 6, 2), (3, 6, 12, 24), 0.2, 224))
    medical = bool(cfg_get(cfg, "medical_adaptations", name == "swin_medical"))
    use_pallas = cfg_get(cfg, "use_pallas_attention", None)
    if use_pallas is None:
        # the fused kernel beats XLA on TPU (docs/DESIGN.md round-2 numbers);
        # elsewhere it would run interpreted, so default by platform
        from ...ops.tpu_platform import is_tpu

        use_pallas = is_tpu()
    return SwinTransformer(
        img_size=int(cfg_get(cfg, "img_size", img)),
        patch_size=int(cfg_get(cfg, "patch_size", 4)),
        in_channels=int(cfg_get(cfg, "in_channels", 1)),
        num_classes=int(cfg_get(cfg, "num_classes", 2)),
        embed_dim=int(cfg_get(cfg, "embed_dim", dim)),
        depths=tuple(cfg_get(cfg, "depths", depths)),
        num_heads=tuple(cfg_get(cfg, "num_heads", heads)),
        window_size=int(cfg_get(cfg, "window_size", 7)),
        mlp_ratio=float(cfg_get(cfg, "mlp_ratio", 4.0)),
        qkv_bias=bool(cfg_get(cfg, "qkv_bias", True)),
        qk_scale=cfg_get(cfg, "qk_scale", None),
        drop_rate=float(cfg_get(cfg, "drop_rate", 0.0)),
        attn_drop_rate=float(cfg_get(cfg, "attn_drop_rate", 0.0)),
        drop_path_rate=float(cfg_get(cfg, "drop_path_rate", dpr)),
        ape=bool(cfg_get(cfg, "ape", False)),
        patch_norm=bool(cfg_get(cfg, "patch_norm", True)),
        medical_adaptations=medical,
        contrast_adaptive=bool(cfg_get(cfg, "contrast_adaptive", False)),
        quality_guided=bool(cfg_get(cfg, "quality_guided", False)),
        uncertainty_head=bool(cfg_get(cfg, "uncertainty_head", False)),
        use_pallas_attention=bool(use_pallas),
        softmax_dtype=(jnp.bfloat16 if cfg_get(cfg, "attn_softmax_dtype", None)
                       in ("bf16", "bfloat16") else jnp.float32),
        remat=bool(cfg_get(cfg, "use_checkpoint", False)),
        dtype=resolve_dtype(cfg),
    )


for _name in SWIN_PARAMS:
    ModelRegistry.register(_name, "vit")(build_swin)


def create_swin_tiny(**kw) -> SwinTransformer:
    return build_swin({"name": "swin_tiny", **kw})


def create_swin_medical(**kw) -> SwinTransformer:
    return build_swin({"name": "swin_medical", **kw})
