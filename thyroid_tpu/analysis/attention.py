"""Attention-map analysis (hook-free, via the models' capture path).

Rebuilds: src/models/vit/attention_utils.py:14-126 (CLS-attention heatmap
overlay, gradient-based patch importance), scripts/generate_attention_maps.py
(per-stage feature std-maps for Swin), and implements attention rollout —
which the reference left as an unimplemented stub (attention_utils.py:129-145).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def collect_attention_maps(model: Any, variables: dict,
                           image: jnp.ndarray) -> List[np.ndarray]:
    """All per-block attention tensors (B, heads, N, N), in depth order."""
    _, inter = model.apply(variables, image, train=False, capture=True,
                           mutable=["intermediates"])
    flat = jax.tree_util.tree_flatten_with_path(inter["intermediates"])[0]
    named = sorted(
        ("/".join(str(k) for k in path), v) for path, v in flat
    )
    out = []
    for name, v in named:
        if "attention" in name:
            arr = v[-1] if isinstance(v, tuple) else v
            if arr.ndim == 4 and arr.shape[-1] == arr.shape[-2]:
                out.append(np.asarray(arr))
    return out


def cls_attention_heatmap(attn: np.ndarray, has_cls: bool = True) -> np.ndarray:
    """Mean-over-heads CLS-row attention reshaped to a square map
    (reference: attention_utils.py:14-81)."""
    a = attn[0].mean(axis=0)             # (N, N)
    row = a[0, 1:] if has_cls else a.mean(axis=0)
    side = int(np.sqrt(len(row)))
    row = row[: side * side]
    hm = row.reshape(side, side)
    return hm / hm.max() if hm.max() > 0 else hm


def attention_rollout(attn_maps: List[np.ndarray],
                      residual: float = 0.5) -> np.ndarray:
    """Attention rollout (Abnar & Zuidema): multiply head-averaged attention
    (mixed with the residual identity) across layers; return the CLS row.
    The reference stubbed this out (attention_utils.py:129-145)."""
    joint: Optional[np.ndarray] = None
    for attn in attn_maps:
        a = attn[0].mean(axis=0)
        a = residual * a + (1 - residual) * np.eye(a.shape[-1])
        a = a / a.sum(axis=-1, keepdims=True)
        joint = a if joint is None else a @ joint
    row = joint[0, 1:]
    side = int(np.sqrt(len(row)))
    hm = row[: side * side].reshape(side, side)
    return hm / hm.max() if hm.max() > 0 else hm


def gradient_patch_importance(model: Any, variables: dict, image: jnp.ndarray,
                              patch_size: int = 16,
                              class_idx: Optional[int] = None) -> np.ndarray:
    """|d score/d input| pooled per patch (reference:
    attention_utils.py:84-126)."""
    def score(img):
        out = model.apply(variables, img, train=False)
        if isinstance(out, tuple):
            out = out[0]
        c = class_idx if class_idx is not None else jnp.argmax(out[0])
        return out[0, c]

    g = np.abs(np.asarray(jax.grad(score)(image)))[0, :, :, 0]
    h, w = g.shape
    ph, pw = h // patch_size, w // patch_size
    g = g[: ph * patch_size, : pw * patch_size]
    pooled = g.reshape(ph, patch_size, pw, patch_size).mean(axis=(1, 3))
    return pooled / pooled.max() if pooled.max() > 0 else pooled


def swin_stage_feature_maps(model: Any, variables: dict,
                            image: jnp.ndarray) -> List[np.ndarray]:
    """Per-stage feature std-maps (reference:
    scripts/generate_attention_maps.py:120-187 — std over channels as a
    spatial 'activity' map per Swin stage)."""
    _, inter = model.apply(variables, image, train=False, capture=True,
                           mutable=["intermediates"])
    flat = jax.tree_util.tree_flatten_with_path(inter["intermediates"])[0]
    maps = []
    for path, v in sorted(flat, key=lambda kv: str(kv[0])):
        name = "/".join(str(k) for k in path)
        if "stage_features" in name:
            arr = np.asarray(v[-1] if isinstance(v, tuple) else v)[0]
            side = int(np.sqrt(arr.shape[0]))
            stds = arr.std(axis=-1)[: side * side].reshape(side, side)
            maps.append(stds / stds.max() if stds.max() > 0 else stds)
    return maps


def attention_figure(image: np.ndarray, heatmaps: Dict[str, np.ndarray],
                     output_path: Optional[str] = None):
    """Multi-panel overlay figure (reference layout: 2×3 grid,
    generate_attention_maps.py)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import cv2

    n = len(heatmaps) + 1
    cols = min(3, n)
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(5 * cols, 5 * rows))
    axes = np.atleast_1d(axes).ravel()
    axes[0].imshow(image.squeeze(), cmap="gray")
    axes[0].set_title("input")
    h, w = image.shape[:2]
    for ax, (name, hm) in zip(axes[1:], heatmaps.items()):
        hm_big = cv2.resize(hm.astype(np.float32), (w, h))
        ax.imshow(image.squeeze(), cmap="gray")
        ax.imshow(hm_big, cmap="jet", alpha=0.45)
        ax.set_title(name)
    for ax in axes:
        ax.axis("off")
    if output_path:
        fig.savefig(output_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig
