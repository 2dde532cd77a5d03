"""Learning-rate schedules and optimizer construction (optax).

Replaces the reference's AdamW + CosineAnnealingLR + manual linear warmup
(reference: src/training/lightning_modules.py:259-309) and layer-wise LR
decay param groups (reference: lightning_modules.py:593-659,
vision_transformer_base.py:569-630).
"""
from __future__ import annotations

import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


def build_schedule(
    base_lr: float,
    steps_per_epoch: int,
    epochs: int,
    warmup_epochs: int = 0,
    warmup_steps: int = 0,
    eta_min: float = 0.0,
    kind: str = "cosine",
    step_size: Optional[int] = None,
    gamma: Optional[float] = None,
) -> optax.Schedule:
    """Linear warmup into cosine/step/constant decay."""
    warmup = warmup_steps or warmup_epochs * steps_per_epoch
    total = max(epochs * steps_per_epoch, warmup + 1)
    if kind in (None, "constant", "none"):
        decay: optax.Schedule = optax.constant_schedule(base_lr)
    elif kind == "cosine":
        decay = optax.cosine_decay_schedule(
            base_lr, max(total - warmup, 1), alpha=eta_min / base_lr if base_lr else 0.0
        )
    elif kind == "step":
        decay = optax.exponential_decay(
            base_lr, (step_size or 30) * steps_per_epoch, gamma or 0.1,
            staircase=True)
    else:
        raise ValueError(f"unknown schedule '{kind}'")
    if warmup <= 0:
        return decay
    return optax.join_schedules(
        [optax.linear_schedule(0.0, base_lr, warmup), decay], [warmup]
    )


def layer_decay_mask(params: Any, decay: float, num_layers: int) -> Any:
    """Per-leaf multiplicative LR scale, the reference's exact recipe
    (lightning_modules.py:628-659, oracled by
    tests/unit/test_layer_decay_oracle.py):

        embedding params (patch_embed / cls_token / pos_embed)  decay²
        block i of L                                            decay^(L−1−i)
        head                                                    1.0

    so the LAST block and the head train at the base LR and block 0 at
    decay^(L−1); the embedding's decay² (HIGHER than early blocks for
    L > 3) is the reference's own quirk, kept as-is. One deliberate
    deviation: the reference builds torch param_groups from ONLY those
    three sets, silently freezing anything else (the final norm, DeiT's
    dist_token/head_dist) — we give such leaves scale 1.0 instead so they
    keep training (documented in docs/DESIGN.md)."""

    def scale(path, _):
        name = "/".join(str(p) for p in path)
        if "patch_embed" in name or "pos_embed" in name \
                or "cls_token" in name or "dist_token" in name \
                or "absolute_pos_embed" in name:
            return decay ** 2
        m = re.search(r"block_(\d+)", name) or re.search(r"stage_(\d+)", name)
        if m:
            return decay ** max(num_layers - 1 - int(m.group(1)), 0)
        return 1.0

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params),
        [scale(tuple(str(k) for k in path), v) for path, v in flat],
    )


def build_optimizer(
    params: Any,
    schedule: optax.Schedule,
    weight_decay: float = 1e-5,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    gradient_clip_val: Optional[float] = 1.0,
    gradient_clip_algorithm: str = "norm",
    layer_decay: Optional[float] = None,
    num_layers: int = 12,
    accumulate_steps: int = 1,
    name: str = "adamw",
) -> optax.GradientTransformation:
    """AdamW (decay masked off LayerNorm/bias/BatchNorm scalars, standard
    practice and equivalent to the reference's param-group split) + clip +
    optional layer-wise LR decay + gradient accumulation."""

    def decay_mask(p):
        return jax.tree.map(lambda x: x.ndim > 1, p)

    chain = []
    if gradient_clip_val:
        if gradient_clip_algorithm == "value":
            chain.append(optax.clip(gradient_clip_val))
        else:
            chain.append(optax.clip_by_global_norm(gradient_clip_val))
    if name == "sgd":
        chain.append(optax.sgd(schedule, momentum=0.9))
    else:
        chain.append(optax.adamw(schedule, b1=beta1, b2=beta2, eps=eps,
                                 weight_decay=weight_decay,
                                 mask=decay_mask(params)))
    if layer_decay is not None and 0 < layer_decay < 1:
        scales = layer_decay_mask(params, layer_decay, num_layers)
        chain.append(_scale_per_leaf(scales))
    tx = optax.chain(*chain)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


def _scale_per_leaf(scales: Any) -> optax.GradientTransformation:
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        return jax.tree.map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init_fn, update_fn)
