"""Vision Transformer family (from scratch, flax).

Rebuilds the reference's custom ViT stack — one unified implementation
instead of the reference's timm-wrapper/from-scratch split (SURVEY §2.3 note):
- VisionTransformerBase semantics: cls token, learnable/sinusoidal pos-embed,
  trunc-normal init, attention capture, cls/gap pooling
  (reference: src/models/vit/vision_transformer_base.py:288-486)
- variants Tiny/Small/Base 192/384/768 with linspace drop-path
  (reference: src/models/vit/vit_models.py:20-142, VIT_PARAMS:266-270)
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..layers import (LN_EPS, Block, PatchEmbed, sincos_pos_embed,
                      token_kernels_default, trunc_normal_init)
from ..registry import ModelRegistry, cfg_get, resolve_dtype

Dtype = Any


class VisionTransformer(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    in_channels: int = 1
    num_classes: int = 2
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    pos_embed_type: str = "learnable"      # learnable | sinusoidal
    pool_type: str = "cls"                 # cls | gap
    class_token: bool = True
    quality_aware: bool = False
    # eval-time fused LN+QKV / LN+MLP+residual Pallas kernels (see
    # models/layers.py Block.token_kernels); default on for TPU via build_vit
    token_kernels: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 capture: bool = False) -> jnp.ndarray:
        det = not train
        b = x.shape[0]
        tokens = PatchEmbed(self.patch_size, self.embed_dim,
                            quality_aware=self.quality_aware,
                            dtype=self.dtype, name="patch_embed")(x)
        n = tokens.shape[1]
        if self.class_token:
            cls = self.param("cls_token", trunc_normal_init,
                             (1, 1, self.embed_dim))
            tokens = jnp.concatenate(
                [jnp.broadcast_to(cls, (b, 1, self.embed_dim)).astype(tokens.dtype),
                 tokens], axis=1)
        seq = tokens.shape[1]
        if self.pos_embed_type == "learnable":
            pe = self.param("pos_embed", trunc_normal_init, (1, seq, self.embed_dim))
        else:
            pe = sincos_pos_embed(seq, self.embed_dim)[None]
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
            # final token features for GradCAM (reference hooks model.norm —
            # scripts/generate_vit_gradcam.py:54-68)
            self.sow("intermediates", "final_tokens", tokens)
        if self.pool_type == "cls" and self.class_token:
            feat = tokens[:, 0]
        else:
            start = 1 if self.class_token else 0
            feat = tokens[:, start:].mean(axis=1)
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        kernel_init=trunc_normal_init, name="head")(feat)

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2


VIT_PARAMS = {
    # name: (embed_dim, depth, num_heads) — reference vit_models.py:266-270
    "vit_tiny": (192, 12, 3),
    "vit_small": (384, 12, 6),
    "vit_base": (768, 12, 12),
}


def build_vit(cfg: Any) -> VisionTransformer:
    name = cfg_get(cfg, "name", "vit_base")
    dim, depth, heads = VIT_PARAMS.get(name, (None, None, None))
    return VisionTransformer(
        img_size=int(cfg_get(cfg, "img_size", 224)),
        patch_size=int(cfg_get(cfg, "patch_size", 16)),
        in_channels=int(cfg_get(cfg, "in_channels", 1)),
        num_classes=int(cfg_get(cfg, "num_classes", 2)),
        embed_dim=int(cfg_get(cfg, "embed_dim", dim or 768)),
        depth=int(cfg_get(cfg, "depth", depth or 12)),
        num_heads=int(cfg_get(cfg, "num_heads", heads or 12)),
        mlp_ratio=float(cfg_get(cfg, "mlp_ratio", 4.0)),
        qkv_bias=bool(cfg_get(cfg, "qkv_bias", True)),
        drop_rate=float(cfg_get(cfg, "drop_rate", 0.0)),
        attn_drop_rate=float(cfg_get(cfg, "attn_drop_rate", 0.0)),
        drop_path_rate=float(cfg_get(cfg, "drop_path_rate", 0.1)),
        pos_embed_type=str(cfg_get(cfg, "pos_embed_type", "learnable")),
        pool_type=str(cfg_get(cfg, "pool_type", "cls")),
        quality_aware=bool(cfg_get(cfg, "quality_aware", False)),
        token_kernels=token_kernels_default(cfg),
        dtype=resolve_dtype(cfg),
    )


for _name in VIT_PARAMS:
    ModelRegistry.register(_name, "vit")(build_vit)


def create_vit_tiny(**kw) -> VisionTransformer:
    return build_vit({"name": "vit_tiny", **kw})


def create_vit_small(**kw) -> VisionTransformer:
    return build_vit({"name": "vit_small", **kw})


def create_vit_base(**kw) -> VisionTransformer:
    return build_vit({"name": "vit_base", **kw})
