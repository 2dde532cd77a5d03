"""Shared model building blocks (flax.linen, NHWC, dtype-polymorphic).

Rebuilds the reference's from-scratch transformer infrastructure
(reference: src/models/vit/vision_transformer_base.py — DropPath:49,
PatchEmbed:67-143 with quality scoring, Attention:146-195 with eval-time
attention capture, Mlp:198, Block:226) as functional flax modules. Attention
maps and quality scores are exposed through flax's `sow` mechanism
("intermediates" collection) instead of torch buffers/hooks.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)

# torch nn.LayerNorm default (the reference stack never overrides it);
# flax's 1e-6 default costs ~1e-3 logit drift over a 12-block ViT vs the
# reference's own forward (tests/unit/test_reference_model_oracle.py).
# The Pallas LN kernels (ops/token_fused.py, ops/attention.py) carry the
# same value as their defaults.
LN_EPS = 1e-5


class LNParams(nn.Module):
    """LayerNorm parameters WITHOUT the computation — fused serving kernels
    compute LN in VMEM, so the caller only needs (scale, bias). Named like
    the nn.LayerNorm it replaces, this creates the exact same param tree
    (checkpoints and the torch importer are unaffected)."""

    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,)),
                self.param("bias", nn.initializers.zeros, (self.dim,)))


class DenseParams(nn.Module):
    """nn.Dense-compatible parameters (kernel/bias, same names and inits)
    exposed raw so fused kernels can consume them directly."""

    in_dim: int
    out_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", trunc_normal_init,
                            (self.in_dim, self.out_dim))
        bias = self.param("bias", nn.initializers.zeros, (self.out_dim,)) \
            if self.use_bias else None
        return kernel, bias


class MlpParams(nn.Module):
    """Mlp-compatible parameter tree (Dense_0, Dense_1) exposed raw for the
    fused LN+MLP serving kernel (ops/token_fused.py)."""

    in_dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        w1, b1 = DenseParams(self.in_dim, self.hidden, name="Dense_0")()
        w2, b2 = DenseParams(self.hidden, self.in_dim, name="Dense_1")()
        return w1, b1, w2, b2


class DropPath(nn.Module):
    """Stochastic depth — drop the residual branch per sample
    (reference: vision_transformer_base.py:49-64)."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: Optional[bool] = None) -> jnp.ndarray:
        det = nn.merge_param("deterministic", self.deterministic, deterministic)
        if det or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class Mlp(nn.Module):
    """Transformer MLP (reference: vision_transformer_base.py:198-223)."""

    hidden_dim: int
    out_dim: Optional[int] = None
    drop_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     kernel_init=trunc_normal_init)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        x = nn.Dense(out_dim, dtype=self.dtype, kernel_init=trunc_normal_init)(x)
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    """Multi-head self-attention with optional attention-map capture.

    The reference stores eval-time attention maps on the module
    (vision_transformer_base.py:186-188); here the softmax weights are
    `sow`-ed into the "intermediates" collection when `capture` is True, so
    callers retrieve them functionally via `mutable=["intermediates"]`.
    """

    num_heads: int
    qkv_bias: bool = True
    attn_drop_rate: float = 0.0
    proj_drop_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 capture: bool = False,
                 ln: Optional[tuple] = None) -> jnp.ndarray:
        b, n, d = x.shape
        head_dim = d // self.num_heads
        if ln is not None:
            # Serving fast path (Block.token_kernels): the caller passes the
            # pre-norm LayerNorm params and this computes LN + QKV in one
            # Pallas kernel (LN never materializes in HBM — ops/
            # token_fused.py). Params are created with the exact names
            # ("Dense_0") and inits the nn.Dense below would use, so the
            # tree is checkpoint-identical across paths. f32-accumulated
            # matmul (vs nn.Dense's compute-dtype accum): ≤1e-2-ULP-class
            # diff, covered by the fused-vs-XLA equivalence test.
            qkv_kernel, qkv_b = DenseParams(d, 3 * d, self.qkv_bias,
                                            name="Dense_0")()
            from ..ops.token_fused import fused_ln_matmul

            qkv = fused_ln_matmul(x, ln[0], ln[1],
                                  qkv_kernel.astype(self.dtype), qkv_b)
        else:
            qkv = nn.Dense(3 * d, use_bias=self.qkv_bias, dtype=self.dtype,
                           kernel_init=trunc_normal_init)(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)                       # (b,n,h,hd) each
        q = q.transpose(0, 2, 1, 3)                             # (b,h,n,hd)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        scale = head_dim ** -0.5
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        if capture:
            self.sow("intermediates", "attention", attn)
        attn = nn.Dropout(self.attn_drop_rate)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        if ln is not None:
            # raw-param out-proj with nn.Dense numerics ("Dense_1" — the
            # name the anonymous Dense below would get on the other path)
            wp, bp = DenseParams(d, d, True, name="Dense_1")()
            out = out @ wp.astype(self.dtype) + bp.astype(self.dtype)
        else:
            out = nn.Dense(d, dtype=self.dtype,
                           kernel_init=trunc_normal_init)(out)
        out = nn.Dropout(self.proj_drop_rate)(out, deterministic=deterministic)
        return out


class PatchEmbed(nn.Module):
    """Patch embedding (conv k=p s=p) with optional quality-aware patch
    scoring head (reference: vision_transformer_base.py:67-143 — conv3x3 →
    conv1x1 → sigmoid → patch-avg-pool → (B, N) scores, sowed)."""

    patch_size: int = 16
    embed_dim: int = 768
    quality_aware: bool = False
    flatten: bool = True
    norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        b, h, w, c = x.shape
        if h % p or w % p:
            raise ValueError(f"image {h}x{w} not divisible by patch size {p}")
        tokens = nn.Conv(self.embed_dim, kernel_size=(p, p), strides=(p, p),
                         dtype=self.dtype, kernel_init=trunc_normal_init,
                         name="proj")(x)                         # (B, H/p, W/p, D)
        if self.quality_aware:
            q = nn.Conv(8, kernel_size=(3, 3), padding="SAME", dtype=self.dtype,
                        name="quality_conv1")(x)
            q = nn.relu(q)
            q = nn.Conv(1, kernel_size=(1, 1), dtype=self.dtype,
                        name="quality_conv2")(q)
            q = nn.sigmoid(q)
            q = nn.avg_pool(q, window_shape=(p, p), strides=(p, p))
            scores = q.reshape(b, -1)                            # (B, N)
            self.sow("intermediates", "patch_quality", scores)
        if self.flatten:
            tokens = tokens.reshape(b, -1, self.embed_dim)       # (B, N, D)
        if self.norm:
            tokens = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)(tokens)
        return tokens


class Block(nn.Module):
    """Pre-norm transformer block (reference: vision_transformer_base.py:226-286)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    # Serving fast path (TPU): LayerNorm+QKV as one Pallas kernel and
    # norm2+MLP+residual as one kernel whose 4C hidden tensor never touches
    # HBM (ops/token_fused.py — the same kernels the Swin serving path
    # uses). Eval-only: dropout/DropPath are identities there, so the math
    # is exact; training and attention-capture keep the XLA path.
    token_kernels: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 capture: bool = False) -> jnp.ndarray:
        d = x.shape[-1]
        fused = self.token_kernels and deterministic and not capture
        if fused:
            g1, b1 = LNParams(d, name="LayerNorm_0")()
            y = Attention(self.num_heads, self.qkv_bias, self.attn_drop_rate,
                          self.drop_rate, dtype=self.dtype,
                          name="Attention_0")(
                x, deterministic=True, ln=(g1, b1))
            x = x + y
            g2, b2 = LNParams(d, name="LayerNorm_1")()
            w1, bb1, w2, bb2 = MlpParams(d, int(d * self.mlp_ratio),
                                         name="Mlp_0")()
            from ..ops.token_fused import fused_ln_mlp_residual

            return fused_ln_mlp_residual(x, g2, b2, w1.astype(self.dtype),
                                         bb1, w2.astype(self.dtype), bb2)
        y = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)(x)
        y = Attention(self.num_heads, self.qkv_bias, self.attn_drop_rate,
                      self.drop_rate, dtype=self.dtype)(
            y, deterministic=deterministic, capture=capture)
        x = x + DropPath(self.drop_path_rate)(y, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)(x)
        y = Mlp(int(d * self.mlp_ratio), drop_rate=self.drop_rate,
                dtype=self.dtype)(y, deterministic=deterministic)
        x = x + DropPath(self.drop_path_rate)(y, deterministic=deterministic)
        return x


def sincos_pos_embed(n: int, dim: int) -> jnp.ndarray:
    """Fixed sinusoidal position embedding (reference alternative to the
    learnable table — vision_transformer_base.py:363-369)."""
    position = jnp.arange(n)[:, None].astype(jnp.float32)
    div = jnp.exp(jnp.arange(0, dim, 2).astype(jnp.float32) *
                  (-jnp.log(10000.0) / dim))
    pe = jnp.zeros((n, dim))
    pe = pe.at[:, 0::2].set(jnp.sin(position * div))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div[: (dim + 1) // 2]))
    return pe


def count_params(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))


def token_kernels_default(cfg) -> bool:
    """Resolve a model config's `token_kernels` flag LAZILY: only probe the
    platform (jax.devices() — backend init, expensive/fragile under the
    axon tunnel) when the config doesn't pin the flag. Compiled Mosaic
    kernels need a real TPU; elsewhere they'd run interpreted."""
    from .registry import cfg_get

    v = cfg_get(cfg, "token_kernels", None)
    if v is not None:
        return bool(v)
    from ..ops.tpu_platform import is_tpu

    return is_tpu()
