"""DeiT — Data-efficient image Transformer with distillation token.

Reference behaviors rebuilt (reference: src/models/vit/deit_models.py):
- distillation token + second head (:77-100)
- train mode returns (cls_logits, dist_logits); eval averages the two heads
  (:220-238)
- DistillationLoss lives in training/losses.py (soft KL·τ² / hard CE —
  reference :417-480)
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..layers import (LN_EPS, Block, PatchEmbed, token_kernels_default,
                      trunc_normal_init)
from ..registry import ModelRegistry, cfg_get, resolve_dtype

Dtype = Any


class DeiT(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    in_channels: int = 1
    num_classes: int = 2
    embed_dim: int = 192
    depth: int = 12
    num_heads: int = 3
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    quality_aware: bool = False
    # eval-time fused LN+QKV / LN+MLP+residual Pallas kernels (see
    # models/layers.py Block.token_kernels); default on for TPU
    token_kernels: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 capture: bool = False):
        det = not train
        b = x.shape[0]
        tokens = PatchEmbed(self.patch_size, self.embed_dim,
                            quality_aware=self.quality_aware,
                            dtype=self.dtype, name="patch_embed")(x)
        cls = self.param("cls_token", trunc_normal_init, (1, 1, self.embed_dim))
        dist = self.param("dist_token", trunc_normal_init, (1, 1, self.embed_dim))
        tokens = jnp.concatenate([
            jnp.broadcast_to(cls, (b, 1, self.embed_dim)).astype(tokens.dtype),
            jnp.broadcast_to(dist, (b, 1, self.embed_dim)).astype(tokens.dtype),
            tokens,
        ], axis=1)
        seq = tokens.shape[1]
        pe = self.param("pos_embed", trunc_normal_init, (1, seq, self.embed_dim))
        tokens = tokens + pe.astype(tokens.dtype)
        tokens = nn.Dropout(self.drop_rate)(tokens, deterministic=det)

        dpr = np.linspace(0.0, self.drop_path_rate, self.depth)
        for i in range(self.depth):
            tokens = Block(self.num_heads, self.mlp_ratio, self.qkv_bias,
                           self.drop_rate, self.attn_drop_rate, float(dpr[i]),
                           token_kernels=self.token_kernels,
                           dtype=self.dtype, name=f"block_{i}")(
                tokens, deterministic=det, capture=capture)
        tokens = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(tokens)
        if capture:
            self.sow("intermediates", "final_tokens", tokens)

        cls_logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                              kernel_init=trunc_normal_init,
                              name="head")(tokens[:, 0])
        dist_logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                               kernel_init=trunc_normal_init,
                               name="head_dist")(tokens[:, 1])
        if train:
            return cls_logits, dist_logits
        return (cls_logits + dist_logits) / 2.0


DEIT_PARAMS = {
    "deit_tiny": (192, 12, 3),
    "deit_small": (384, 12, 6),
    "deit_base": (768, 12, 12),
}


def build_deit(cfg: Any) -> DeiT:
    name = cfg_get(cfg, "name", "deit_tiny")
    dim, depth, heads = DEIT_PARAMS.get(name, (192, 12, 3))
    return DeiT(
        img_size=int(cfg_get(cfg, "img_size", 224)),
        patch_size=int(cfg_get(cfg, "patch_size", 16)),
        in_channels=int(cfg_get(cfg, "in_channels", 1)),
        num_classes=int(cfg_get(cfg, "num_classes", 2)),
        embed_dim=int(cfg_get(cfg, "embed_dim", dim)),
        depth=int(cfg_get(cfg, "depth", depth)),
        num_heads=int(cfg_get(cfg, "num_heads", heads)),
        mlp_ratio=float(cfg_get(cfg, "mlp_ratio", 4.0)),
        qkv_bias=bool(cfg_get(cfg, "qkv_bias", True)),
        drop_rate=float(cfg_get(cfg, "drop_rate", 0.0)),
        attn_drop_rate=float(cfg_get(cfg, "attn_drop_rate", 0.0)),
        drop_path_rate=float(cfg_get(cfg, "drop_path_rate", 0.1)),
        quality_aware=bool(cfg_get(cfg, "quality_aware", False)),
        token_kernels=token_kernels_default(cfg),
        dtype=resolve_dtype(cfg),
    )


for _name in DEIT_PARAMS:
    ModelRegistry.register(_name, "vit")(build_deit)
