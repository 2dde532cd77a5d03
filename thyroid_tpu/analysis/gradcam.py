"""GradCAM — on-device, hook-free.

Rebuilds the reference's hook-based GradCAM (reference:
scripts/generate_vit_gradcam.py:54-120 for ViT/Swin — hooks on the final
`norm` tokens; scripts/generate_densenet_gradcam.py:47 for CNNs — hooks on
the last conv features) the JAX way: the model's `capture=True` path sows the
target activation into the "intermediates" collection, and the gradient
w.r.t. that activation comes from `jax.grad` through a functionally
re-entrant forward (activation override via closure), all inside one jit.

Weighting matches the reference math: channel weights = gradients pooled
over all spatial/token positions; heatmap = ReLU(Σ_c w_c · act_c),
max-normalised, CLS token stripped for (N+1)-token maps
(generate_vit_gradcam.py:92-111).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.image import resize_bilinear


def _final_activation(intermediates: Any) -> jnp.ndarray:
    """Pull the sown GradCAM target out of the intermediates tree: ViT/DeiT/
    Swin sow 'final_tokens'; CNNs sow 'features'."""
    flat = jax.tree_util.tree_flatten_with_path(intermediates)[0]
    named = {"/".join(str(k) for k in path): v for path, v in flat}
    for key in ("final_tokens", "features"):
        hits = [v for name, v in named.items() if key in name]
        if hits:
            return hits[-1]
    raise ValueError(f"no GradCAM target in intermediates: {list(named)}")


def gradcam(
    model: Any,
    variables: dict,
    image: jnp.ndarray,
    class_idx: Optional[int] = None,
) -> Tuple[np.ndarray, int, float]:
    """→ (heatmap HxW in [0,1], predicted/queried class, confidence).

    image: (1, H, W, C) preprocessed input.
    """
    logits, inter = model.apply(variables, image, train=False, capture=True,
                                mutable=["intermediates"])
    if isinstance(logits, tuple):
        logits = logits[0]
    probs = jax.nn.softmax(logits, axis=-1)
    cls = int(class_idx) if class_idx is not None else int(jnp.argmax(logits[0]))
    confidence = float(probs[0, cls])
    act = _final_activation(inter["intermediates"])
    if isinstance(act, tuple):
        act = act[-1]

    # The capture point sits immediately before the classification head
    # (post-norm tokens for transformers, post-conv features for CNNs), so
    # d score/d activation is exactly the gradient through the re-applied
    # head: grad_eps head(act + eps)[cls] at eps = 0.
    def score(eps):
        return _apply_head(model, variables, act + eps)[0, cls]

    grads_act = jax.grad(score)(jnp.zeros_like(act))

    heatmap = _weight_and_pool(np.asarray(act), np.asarray(grads_act))
    return heatmap, cls, confidence


def _apply_head(model, variables, act: jnp.ndarray) -> jnp.ndarray:
    """Re-apply the classification head to a (possibly perturbed)
    captured activation. The capture points are placed AFTER the final norm
    (transformers) / final conv stack (CNNs), so the head is:
    token-mean/cls-select → Dense(head|fc|classifier)."""
    params = variables["params"]
    head_name = next(n for n in ("head", "fc", "classifier") if n in params)
    kernel = params[head_name]["kernel"]
    bias = params[head_name].get("bias", 0.0)
    if act.ndim == 3:  # (B, N, D) tokens
        pool_cls = hasattr(model, "pool_type") and \
            getattr(model, "pool_type", "gap") == "cls" and \
            getattr(model, "class_token", False)
        feat = act[:, 0] if pool_cls else act.mean(axis=1)
    else:  # (B, H, W, C) conv features
        feat = act.mean(axis=(1, 2))
    return feat @ kernel + bias


def _weight_and_pool(act: np.ndarray, grads: np.ndarray) -> np.ndarray:
    """Reference weighting (generate_vit_gradcam.py:92-111): pool grads over
    positions → weight channels → mean → ReLU → max-normalise; strip CLS/dist
    tokens when the token count is not a perfect square."""
    act = act[0]
    grads = grads[0]
    if act.ndim == 3:  # conv features (H, W, C)
        weights = grads.mean(axis=(0, 1))
        heat = np.maximum((act * weights).mean(axis=-1), 0.0)
        return heat / heat.max() if heat.max() > 0 else heat
    # token features (N, D)
    n, _ = act.shape
    weights = grads.mean(axis=0)
    side = int(np.sqrt(n))
    if side * side != n:
        for strip in (1, 2):  # CLS / CLS+dist tokens
            side = int(np.sqrt(n - strip))
            if side * side == n - strip:
                act = act[strip:]
                break
        else:
            raise ValueError(f"token count {n} is not square(+1|+2)")
    heat = np.maximum((act * weights).mean(axis=-1), 0.0)
    heat = heat / heat.max() if heat.max() > 0 else heat
    return heat.reshape(side, side)


def gradcam_overlay(
    heatmap: np.ndarray,
    image: np.ndarray,
    output_path: Optional[str] = None,
    title: str = "",
):
    """Contour overlay figure (reference: generate_vit_gradcam.py:127-198)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    h, w = image.shape[:2]
    hm = np.asarray(resize_bilinear(
        jnp.asarray(heatmap[None, :, :, None].astype(np.float32)), (h, w)))[0, :, :, 0]
    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    axes[0].imshow(image.squeeze(), cmap="gray")
    axes[0].set_title("input")
    axes[1].imshow(hm, cmap="jet")
    axes[1].set_title("Grad-CAM")
    axes[2].imshow(image.squeeze(), cmap="gray")
    axes[2].imshow(hm, cmap="jet", alpha=0.4)
    axes[2].contour(hm, levels=[0.5, 0.75], colors="cyan", linewidths=1.0)
    axes[2].set_title(title or "overlay")
    for ax in axes:
        ax.axis("off")
    if output_path:
        fig.savefig(output_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig
