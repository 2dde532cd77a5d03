"""Raw-vs-processed sample figures — library backing for
scripts/generate_sample_images.py (reference:
scripts/generate_sample_cars_images.py:28-527 — sample grids, feature
comparisons, intensity distributions, per-stage preprocessing comparison).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np


def _agg():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _norm01(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.float32)
    lo, hi = float(x.min()), float(x.max())
    return (x - lo) / max(hi - lo, 1e-9)


def create_sample_grid(raw: np.ndarray, processed: np.ndarray,
                       labels: np.ndarray, n_samples: int = 6,
                       output_path: Optional[str | Path] = None):
    """Raw (top row) vs processed (bottom row) per class
    (reference: generate_sample_cars_images.py:28-124)."""
    plt = _agg()
    sel = np.concatenate([np.nonzero(labels == 0)[0][: n_samples // 2],
                          np.nonzero(labels == 1)[0][: n_samples // 2]])
    fig, axes = plt.subplots(2, len(sel), figsize=(2.4 * len(sel), 5.2))
    for col, i in enumerate(sel):
        name = "normal" if labels[i] == 0 else "cancerous"
        axes[0, col].imshow(_norm01(raw[i].squeeze()), cmap="gray")
        axes[0, col].set_title(name, fontsize=9,
                               color="green" if labels[i] == 0 else "red")
        axes[1, col].imshow(_norm01(processed[i].squeeze()), cmap="gray")
        for r in (0, 1):
            axes[r, col].axis("off")
    axes[0, 0].set_ylabel("raw")
    axes[1, 0].set_ylabel("processed")
    fig.suptitle("Raw vs quality-processed samples")
    fig.tight_layout()
    if output_path:
        fig.savefig(output_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig


def _image_features(batch: np.ndarray) -> Dict[str, np.ndarray]:
    """Per-image texture/edge statistics (reference feature comparison
    :126-266): gradient magnitude, Laplacian variance (sharpness), local
    contrast, mean/std intensity."""
    import cv2

    feats = {"gradient": [], "sharpness": [], "contrast": [],
             "mean": [], "std": []}
    for img in batch:
        g = _norm01(np.asarray(img).squeeze())
        gx = cv2.Sobel(g, cv2.CV_32F, 1, 0)
        gy = cv2.Sobel(g, cv2.CV_32F, 0, 1)
        feats["gradient"].append(float(np.hypot(gx, gy).mean()))
        feats["sharpness"].append(float(cv2.Laplacian(g, cv2.CV_32F).var()))
        local_mean = cv2.blur(g, (9, 9))
        feats["contrast"].append(float(np.abs(g - local_mean).mean()))
        feats["mean"].append(float(g.mean()))
        feats["std"].append(float(g.std()))
    return {k: np.asarray(v) for k, v in feats.items()}


def create_feature_comparison(raw: np.ndarray, processed: np.ndarray,
                              output_path: Optional[str | Path] = None):
    """Distribution of texture/edge features, raw vs processed
    (reference: :126-266)."""
    plt = _agg()
    fr, fp = _image_features(raw), _image_features(processed)
    keys = list(fr)
    fig, axes = plt.subplots(1, len(keys), figsize=(3.2 * len(keys), 3.4))
    for ax, k in zip(axes, keys):
        ax.hist(fr[k], bins=20, alpha=0.6, label="raw")
        ax.hist(fp[k], bins=20, alpha=0.6, label="processed")
        ax.set_title(k, fontsize=10)
    axes[0].legend()
    fig.suptitle("Image features: raw vs processed")
    fig.tight_layout()
    if output_path:
        fig.savefig(output_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig


def create_intensity_distribution_plot(
        raw: np.ndarray, processed: Optional[np.ndarray] = None,
        labels: Optional[np.ndarray] = None,
        output_path: Optional[str | Path] = None):
    """Pixel-intensity distributions, optionally per class and raw vs
    processed (reference: :268-385)."""
    plt = _agg()
    ncols = 2 if processed is not None else 1
    fig, axes = plt.subplots(1, ncols + 1, figsize=(5 * (ncols + 1), 4))
    sets = [("raw", raw)] + ([("processed", processed)]
                             if processed is not None else [])
    for ax, (name, batch) in zip(axes, sets):
        flat = _norm01(np.asarray(batch)).reshape(len(batch), -1)
        if labels is not None:
            for cls, cname in ((0, "normal"), (1, "cancerous")):
                vals = flat[np.asarray(labels) == cls].ravel()[::97]
                ax.hist(vals, bins=50, alpha=0.6, density=True, label=cname)
            ax.legend()
        else:
            ax.hist(flat.ravel()[::97], bins=50, density=True)
        ax.set_title(f"{name} pixel intensities")
    means_ax = axes[-1]
    for name, batch in sets:
        means = _norm01(np.asarray(batch)).reshape(len(batch), -1).mean(1)
        means_ax.hist(means, bins=25, alpha=0.6, label=name)
    means_ax.set_title("per-image means")
    means_ax.legend()
    fig.tight_layout()
    if output_path:
        fig.savefig(output_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig


def create_preprocessing_comparison(raw_image: np.ndarray,
                                    output_path: Optional[str | Path] = None):
    """One image through each preprocessing stage (reference: :527-649):
    raw → gamma → CLAHE → artifact suppression → percentile normalize,
    using the on-device ops so the figure shows the REAL pipeline."""
    import jax.numpy as jnp

    from ..ops.clahe import clahe_uint16
    from ..ops.image import adaptive_normalize
    from ..ops.quality import QualityParams, quality_preprocess

    plt = _agg()
    x = np.asarray(raw_image).squeeze().astype(np.float32)
    if x.max() <= 1.5:
        x = x * 65535.0
    batch = jnp.asarray(x[None, :, :, None])
    gamma = np.asarray(jnp.power(batch / 65535.0, 0.6) * 65535.0)
    cl = np.asarray(clahe_uint16(batch.astype(jnp.float32)))
    quality = np.asarray(quality_preprocess(batch, QualityParams()))
    norm = np.asarray(adaptive_normalize(batch, method="percentile",
                                         percentiles=(1.0, 99.0)))
    stages = [("raw", x), ("gamma 0.6", gamma[0, ..., 0]),
              ("CLAHE", cl[0, ..., 0]),
              ("quality pipeline", quality[0, ..., 0]),
              ("percentile norm", norm[0, ..., 0])]
    fig, axes = plt.subplots(1, len(stages), figsize=(3 * len(stages), 3.4))
    for ax, (name, img) in zip(axes, stages):
        ax.imshow(_norm01(img), cmap="gray")
        ax.set_title(name, fontsize=9)
        ax.axis("off")
    fig.suptitle("Preprocessing stages")
    fig.tight_layout()
    if output_path:
        fig.savefig(output_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig
