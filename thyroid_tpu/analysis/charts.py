"""Performance charts + dataset visualisation.

Rebuilds: scripts/generate_performance_charts.py (accuracy/params/time
comparison charts; the reference hard-codes its results table at :29-54 —
here charts read measured results from all_models_summary.json / explicit
dicts, with the reference's published numbers importable for comparison) and
src/data/visualize.py (sample grids, stats, class distribution).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Sequence

import numpy as np

# The reference's published results (scripts/generate_performance_charts.py:29-54)
# — kept as the comparison baseline, clearly labelled as such.
REFERENCE_RESULTS = {
    # name: (test_acc %, params M, train minutes, family)
    "resnet18": (85.29, 11.2, 45, "cnn"),
    "resnet34": (85.29, 21.3, 50, "cnn"),
    "resnet50": (91.18, 23.5, 45, "cnn"),
    "resnet101": (75.00, 42.5, 60, "cnn"),
    "efficientnet_b0": (89.71, 4.0, 30, "cnn"),
    "efficientnet_b1": (83.82, 6.5, 35, "cnn"),
    "efficientnet_b2": (89.71, 7.7, 40, "cnn"),
    "efficientnet_b3": (88.24, 10.7, 45, "cnn"),
    "densenet121": (88.24, 7.8, 50, "cnn"),
    "inception_v3": (76.47, 21.8, 55, "cnn"),
    "inception_v4": (77.94, 23.2, 60, "cnn"),
    "cnn_ensemble": (92.65, 35.3, 0, "ensemble"),
    "vit_tiny": (83.82, 5.7, 0, "vit"),
    "vit_small": (77.94, 22.0, 0, "vit"),
    "vit_base": (88.24, 86.0, 0, "vit"),
    "deit_tiny": (86.76, 5.7, 0, "vit"),
    "deit_small": (85.29, 22.0, 0, "vit"),
    "deit_base": (83.82, 86.0, 0, "vit"),
    "swin_tiny": (94.12, 28.0, 38, "vit"),
    "swin_small": (91.18, 49.0, 0, "vit"),
    "swin_base": (92.65, 87.0, 0, "vit"),
    "swin_medical": (91.18, 49.0, 0, "vit"),
}


def load_results_from_summary(path: str | Path) -> Dict[str, Dict[str, Any]]:
    """Read measured results from an all_models_summary.json."""
    data = json.loads(Path(path).read_text())
    out = {}
    for name, rec in data.items():
        if isinstance(rec, dict) and rec.get("avg_accuracy") is not None:
            out[name] = {"accuracy": rec["avg_accuracy"] * 100.0,
                         "std": (rec.get("std_accuracy") or 0.0) * 100.0}
    return out


def performance_chart(
    results: Dict[str, Dict[str, Any]],
    output_path: Optional[str | Path] = None,
    reference: Optional[Dict[str, Any]] = None,
    title: str = "model comparison (test accuracy %)",
):
    """Bar chart of measured accuracies, optional reference overlay."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = sorted(results, key=lambda n: -results[n]["accuracy"])
    accs = [results[n]["accuracy"] for n in names]
    errs = [results[n].get("std", 0.0) for n in names]
    fig, ax = plt.subplots(figsize=(max(8, 0.6 * len(names)), 5))
    x = np.arange(len(names))
    ax.bar(x, accs, yerr=errs, capsize=3, label="this framework (TPU)")
    if reference:
        ref = [reference.get(n, (np.nan,))[0] if isinstance(reference.get(n), tuple)
               else reference.get(n, np.nan) for n in names]
        ax.plot(x, ref, "r_", markersize=18, label="reference (PyTorch)")
    ax.set_xticks(x, names, rotation=45, ha="right")
    ax.set_ylabel("test accuracy (%)")
    ax.set_title(title)
    ax.legend()
    fig.tight_layout()
    if output_path:
        fig.savefig(output_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig


def accuracy_vs_params_chart(
    results: Dict[str, Dict[str, Any]],
    output_path: Optional[str | Path] = None,
):
    """Scatter accuracy vs parameter count (reference chart family)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 6))
    for name, rec in results.items():
        params = rec.get("params_m")
        if params is None:
            continue
        ax.scatter(params, rec["accuracy"])
        ax.annotate(name, (params, rec["accuracy"]), fontsize=8,
                    xytext=(3, 3), textcoords="offset points")
    ax.set_xlabel("parameters (M)")
    ax.set_ylabel("test accuracy (%)")
    ax.set_title("accuracy vs model size")
    fig.tight_layout()
    if output_path:
        fig.savefig(output_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig


# ---------------------------------------------------------------------------
# dataset visualisation (reference: src/data/visualize.py)
# ---------------------------------------------------------------------------

def visualize_samples(images: np.ndarray, labels: np.ndarray,
                      n: int = 8, output_path: Optional[str | Path] = None):
    """Sample grid by class (reference: visualize.py:95-158)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    idx0 = np.nonzero(labels == 0)[0][: n // 2]
    idx1 = np.nonzero(labels == 1)[0][: n // 2]
    sel = np.concatenate([idx0, idx1])
    fig, axes = plt.subplots(2, n // 2, figsize=(2.2 * (n // 2), 5))
    for ax, i in zip(axes.ravel(), sel):
        ax.imshow(images[i].squeeze(), cmap="gray")
        ax.set_title("normal" if labels[i] == 0 else "cancerous", fontsize=9)
        ax.axis("off")
    fig.tight_layout()
    if output_path:
        fig.savefig(output_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig


def visualize_image_statistics(images: np.ndarray, labels: np.ndarray,
                               output_path: Optional[str | Path] = None):
    """Intensity histograms + per-class stats (reference: visualize.py:34-93)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    means = images.reshape(len(images), -1).mean(axis=1)
    stds = images.reshape(len(images), -1).std(axis=1)
    for cls, name in ((0, "normal"), (1, "cancerous")):
        axes[0].hist(means[labels == cls], bins=30, alpha=0.6, label=name)
        axes[1].hist(stds[labels == cls], bins=30, alpha=0.6, label=name)
    axes[0].set_title("mean intensity")
    axes[1].set_title("std intensity")
    axes[2].bar(["normal", "cancerous"],
                [(labels == 0).sum(), (labels == 1).sum()])
    axes[2].set_title("class distribution")
    for ax in axes[:2]:
        ax.legend()
    fig.tight_layout()
    if output_path:
        fig.savefig(output_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig


def visualize_augmentations(image: np.ndarray, augmented: Dict[str, np.ndarray],
                            output_path: Optional[str | Path] = None):
    """Original vs augmented views grid (reference: visualize.py:160-208)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(augmented) + 1
    fig, axes = plt.subplots(1, n, figsize=(3 * n, 3.2))
    axes[0].imshow(image.squeeze(), cmap="gray")
    axes[0].set_title("original", fontsize=9)
    for ax, (name, img) in zip(axes[1:], augmented.items()):
        ax.imshow(np.asarray(img).squeeze(), cmap="gray")
        ax.set_title(name, fontsize=9)
    for ax in axes:
        ax.axis("off")
    fig.tight_layout()
    if output_path:
        fig.savefig(output_path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig


def create_augmentation_comparison_grid(
    images: np.ndarray,
    labels: np.ndarray,
    key=None,
    n_originals: int = 3,
    n_augmentations: int = 4,
    level: str = "medium",
    output_path: Optional[str | Path] = None,
):
    """Originals (rows) × repeated augmentations (columns) grid
    (reference: visualize.py:263-318)."""
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..ops.augment import train_augment

    key = key if key is not None else jax.random.PRNGKey(0)
    sel = np.linspace(0, len(images) - 1, n_originals).astype(int)
    fig, axes = plt.subplots(n_originals, n_augmentations + 1,
                             figsize=(3 * (n_augmentations + 1),
                                      3 * n_originals))
    axes = np.atleast_2d(axes)
    fig.suptitle("Original vs Augmented Images", fontsize=14)
    batch = jnp.asarray(images[sel].astype(np.float32))
    if batch.ndim == 3:
        batch = batch[..., None]
    if batch.max() > 1.5:
        batch = batch / float(batch.max())
    for row, i in enumerate(sel):
        axes[row, 0].imshow(np.asarray(batch[row]).squeeze(), cmap="gray")
        axes[row, 0].set_title("Original" if row == 0 else "")
        name = "Normal" if labels[i] == 0 else "Cancer"
        axes[row, 0].set_ylabel(name,
                                color="green" if labels[i] == 0 else "red")
        axes[row, 0].axis("off")
    for col in range(1, n_augmentations + 1):
        aug = train_augment(batch, jax.random.fold_in(key, col), level=level)
        for row in range(n_originals):
            axes[row, col].imshow(np.asarray(aug[row]).squeeze(), cmap="gray")
            if row == 0:
                axes[row, col].set_title(f"Aug {col}")
            axes[row, col].axis("off")
    fig.tight_layout()
    if output_path:
        fig.savefig(output_path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig


def plot_class_distribution(labels: np.ndarray,
                            output_path: Optional[str | Path] = None):
    """Standalone class-balance bar + pie (reference: visualize.py:320-364)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    counts = [(labels == 0).sum(), (labels == 1).sum()]
    fig, axes = plt.subplots(1, 2, figsize=(9, 4))
    axes[0].bar(["normal", "cancerous"], counts, color=["green", "red"])
    axes[0].set_ylabel("images")
    for i, c in enumerate(counts):
        axes[0].text(i, c, str(int(c)), ha="center", va="bottom")
    axes[1].pie(counts, labels=["normal", "cancerous"], autopct="%1.1f%%",
                colors=["lightgreen", "lightcoral"])
    fig.suptitle("Class distribution")
    fig.tight_layout()
    if output_path:
        fig.savefig(output_path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig


def visualize_dataset(dataset_config, output_dir: str | Path,
                      splits=("train", "val", "test")) -> Dict[str, list]:
    """Run the full figure set per split (reference: visualize.py:366-448):
    intensity statistics, sample grid, augmentation grid (train only),
    batch diversity, class distribution. Returns {split: [figure paths]}."""
    import jax

    from ..data.dataset import CARSThyroidDataset

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    written: Dict[str, list] = {}
    for split in splits:
        ds = CARSThyroidDataset(dataset_config, split=split)
        images = ds.load_images().astype(np.float32) / 65535.0
        labels = np.asarray(ds.labels)
        paths = []
        for name, fn in (
            ("stats", lambda p: visualize_image_statistics(images, labels, p)),
            ("samples", lambda p: visualize_samples(images, labels,
                                                    output_path=p)),
            ("class_distribution", lambda p: plot_class_distribution(labels, p)),
            ("batch_diversity", lambda p: visualize_batch_diversity(
                images[:16], p)),
        ):
            p = out / f"{split}_{name}.png"
            fn(p)
            paths.append(str(p))
        if split == "train":
            p = out / "train_augmentation_grid.png"
            create_augmentation_comparison_grid(
                images, labels, jax.random.PRNGKey(0), output_path=p)
            paths.append(str(p))
        written[split] = paths
    return written


def visualize_batch_diversity(batch: np.ndarray,
                              output_path: Optional[str | Path] = None):
    """Per-batch intensity spread + sample grid (reference:
    visualize.py:210-318)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    batch = np.asarray(batch)
    n = min(8, len(batch))
    fig, axes = plt.subplots(2, max(n // 2, 1) + 1, figsize=(3 * (n // 2 + 1), 6))
    for i in range(n):
        ax = axes[i % 2][i // 2]
        ax.imshow(batch[i].squeeze(), cmap="gray")
        ax.axis("off")
    stat_ax = axes[0][-1]
    means = batch.reshape(len(batch), -1).mean(axis=1)
    stds = batch.reshape(len(batch), -1).std(axis=1)
    stat_ax.scatter(means, stds)
    stat_ax.set_xlabel("mean")
    stat_ax.set_ylabel("std")
    stat_ax.set_title("batch diversity")
    axes[1][-1].axis("off")
    fig.tight_layout()
    if output_path:
        fig.savefig(output_path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig
