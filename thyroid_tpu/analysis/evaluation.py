"""Evaluation artifacts: confusion matrices, ROC curves, ensemble k-fold
evaluation, TTA inference.

Rebuilds: scripts/generate_confusion_roc.py (per-model confusion + ROC/AUC +
combined ROC figure from best checkpoints), scripts/
run_ensemble_kfold_evaluation.py (7-fold weighted-prob ensemble with
sens/spec/ppv/npv), and the TTA evaluation path
(src/data/transforms.py:309 get_tta_transforms consumers).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import ModelRegistry, cfg_get
from ..ops.augment import tta_views
from ..training.checkpoint import load_checkpoint
from ..training.metrics import MetricAccumulator, auroc
from ..utils.logging import get_logger

logger = get_logger(__name__)


def predict_probs(model: Any, variables: dict, pipeline,
                  tta: bool = False) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """→ (probs (N,2), labels (N,), weights (N,)) over a DevicePipeline."""
    all_p, all_l, all_w = [], [], []
    for batch in pipeline.epoch(jax.random.PRNGKey(0)):
        if tta:
            views = tta_views(batch.image)
            probs = sum(_apply_probs(model, variables, v) for v in views) / len(views)
        else:
            probs = _apply_probs(model, variables, batch.image)
        all_p.append(np.asarray(probs))
        all_l.append(np.asarray(batch.label))
        all_w.append(np.asarray(batch.weight))
    p = np.concatenate(all_p)
    l = np.concatenate(all_l)
    w = np.concatenate(all_w)
    keep = w > 0
    return p[keep], l[keep], w[keep]


def _apply_probs(model, variables, images) -> jnp.ndarray:
    out = model.apply(variables, images, train=False)
    if isinstance(out, tuple):
        out = out[0]
    return jax.nn.softmax(out.astype(jnp.float32), axis=-1)


def binary_report(probs: np.ndarray, labels: np.ndarray) -> Dict[str, float]:
    """Full metric report incl. confusion-derived sens/spec/ppv/npv
    (reference: run_ensemble_kfold_evaluation.py:108-124)."""
    preds = (probs[:, 1] >= 0.5).astype(int)
    tp = int(((preds == 1) & (labels == 1)).sum())
    fp = int(((preds == 1) & (labels == 0)).sum())
    tn = int(((preds == 0) & (labels == 0)).sum())
    fn = int(((preds == 0) & (labels == 1)).sum())
    eps = 1e-6
    return {
        "accuracy": (tp + tn) / max(len(labels), 1),
        "auc": auroc(probs[:, 1], labels),
        "sensitivity": tp / max(tp + fn, eps),
        "specificity": tn / max(tn + fp, eps),
        "ppv": tp / max(tp + fp, eps),
        "npv": tn / (tn + fn + eps),
        "f1": 2 * tp / max(2 * tp + fp + fn, eps),
        "confusion_matrix": [[tn, fp], [fn, tp]],
    }


def roc_curve_points(probs1: np.ndarray, labels: np.ndarray,
                     n_thresholds: int = 101) -> Tuple[np.ndarray, np.ndarray]:
    """(fpr, tpr) arrays over a threshold sweep."""
    thresholds = np.linspace(0.0, 1.0, n_thresholds)
    pos = labels == 1
    neg = ~pos
    tpr = np.array([(probs1[pos] >= t).mean() if pos.any() else 0.0
                    for t in thresholds])
    fpr = np.array([(probs1[neg] >= t).mean() if neg.any() else 0.0
                    for t in thresholds])
    return fpr[::-1], tpr[::-1]


def evaluate_checkpoint(
    checkpoint_path: str | Path,
    model_config: Any = None,
    pipeline=None,
    tta: bool = False,
) -> Dict[str, Any]:
    """model_config=None rebuilds the model from the config stored in the
    checkpoint's metadata (written by Trainer.fit) — the safe default: a bare
    name would silently drop architecture flags (e.g. Swin medical
    adaptations) the weights were trained with."""
    variables, meta = load_checkpoint(checkpoint_path)
    if model_config is None:
        model_config = meta.get("model_config")
        if model_config is None:
            raise ValueError(
                f"checkpoint {checkpoint_path} has no stored model_config; "
                "pass model_config explicitly")
    model = ModelRegistry.create_model(model_config)
    probs, labels, _ = predict_probs(model, variables, pipeline, tta=tta)
    report = binary_report(probs, labels)
    report["checkpoint"] = str(checkpoint_path)
    report["checkpoint_metadata"] = meta
    return report


def evaluate_ensemble_kfold(
    member_specs: Sequence[Dict[str, Any]],
    fold_pipelines: Dict[int, Any],
    weights: Optional[Sequence[float]] = None,
    output_path: Optional[str | Path] = None,
) -> Dict[str, Any]:
    """Weighted-probability ensemble evaluated per fold then aggregated
    (reference: scripts/run_ensemble_kfold_evaluation.py — default member
    weights 0.50/0.25/0.25 at :164).

    member_specs: [{"model": cfg, "checkpoints": {fold: path}}, ...]
    """
    if weights is None:
        weights = [0.5, 0.25, 0.25][: len(member_specs)]
    w = np.asarray(weights, dtype=np.float64)
    w = w / w.sum()
    fold_reports: Dict[str, Any] = {}
    for fold, pipeline in fold_pipelines.items():
        probs_sum, labels = None, None
        for spec, wi in zip(member_specs, w):
            model = ModelRegistry.create_model(spec["model"])
            variables, _ = load_checkpoint(spec["checkpoints"][fold])
            probs, labels, _ = predict_probs(model, variables, pipeline)
            probs_sum = probs * wi if probs_sum is None else probs_sum + probs * wi
        fold_reports[f"fold_{fold}"] = binary_report(probs_sum, labels)
    accs = [r["accuracy"] for r in fold_reports.values()]
    aucs = [r["auc"] for r in fold_reports.values() if np.isfinite(r["auc"])]
    summary = {
        "weights": w.tolist(),
        "folds": fold_reports,
        "mean_accuracy": float(np.mean(accs)),
        "std_accuracy": float(np.std(accs)),
        "mean_auc": float(np.mean(aucs)) if aucs else None,
    }
    if output_path:
        Path(output_path).parent.mkdir(parents=True, exist_ok=True)
        with open(output_path, "w") as f:
            json.dump(summary, f, indent=2, default=str)
    return summary


def confusion_roc_figure(
    reports: Dict[str, Dict[str, Any]],
    roc_data: Dict[str, Tuple[np.ndarray, np.ndarray]],
    output_path: Optional[str | Path] = None,
):
    """Per-model confusion matrices + combined ROC (reference:
    scripts/generate_confusion_roc.py:57-340)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(reports)
    fig, axes = plt.subplots(1, n + 1, figsize=(4 * (n + 1), 4))
    axes = np.atleast_1d(axes)
    for ax, (name, rep) in zip(axes[:-1], reports.items()):
        cm = np.asarray(rep["confusion_matrix"])
        ax.imshow(cm, cmap="Blues")
        for i in range(2):
            for j in range(2):
                ax.text(j, i, str(int(cm[i, j])), ha="center", va="center")
        ax.set_title(f"{name}\nacc={rep['accuracy']:.3f}")
        ax.set_xticks([0, 1], ["normal", "cancer"])
        ax.set_yticks([0, 1], ["normal", "cancer"])
        ax.set_xlabel("predicted")
        ax.set_ylabel("true")
    ax = axes[-1]
    for name, (fpr, tpr) in roc_data.items():
        auc_val = reports.get(name, {}).get("auc", float("nan"))
        ax.plot(fpr, tpr, label=f"{name} (AUC={auc_val:.3f})")
    ax.plot([0, 1], [0, 1], "k--", alpha=0.4)
    ax.set_xlabel("FPR")
    ax.set_ylabel("TPR")
    ax.set_title("ROC")
    ax.legend(fontsize=8)
    fig.tight_layout()
    if output_path:
        fig.savefig(output_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig
