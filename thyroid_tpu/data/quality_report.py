"""Data-quality report generation.

Produces reports/quality_report.json with the reference's schema
(reference: scripts/data_quality_report.py:81-134 and the consumer contract in
src/data/quality_preprocessing.py:58-83):

    dataset_stats.{split}.metrics = {
        mean_intensity, std_intensity, min, max,
        quality_issues: {extreme_dark: [...], low_contrast: [...],
                         potential_artifacts: [...]}   # per-split index lists
    }

Stats are computed batched on device via ops.quality_issue_masks.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ..ops.image import quality_issue_masks, quality_stats, to_uint16_scale
from .dataset import CARSThyroidDataset


def analyze_split(images_u16: np.ndarray) -> Dict[str, Any]:
    """Per-split stats + issue index lists from a (N,H,W,1) uint16 array."""
    x = to_uint16_scale(jnp.asarray(images_u16.astype(np.float32)))
    stats = {k: np.asarray(v) for k, v in quality_stats(x).items()}
    masks = {k: np.asarray(v) for k, v in quality_issue_masks(x).items()}
    return {
        "num_images": int(len(images_u16)),
        "mean_intensity": float(stats["mean"].mean()),
        "std_intensity": float(stats["std"].mean()),
        "min": float(stats["min"].min()),
        "max": float(stats["max"].max()),
        "per_image": {
            "mean": stats["mean"].tolist(),
            "std": stats["std"].tolist(),
            "max": stats["max"].tolist(),
        },
        "quality_issues": {
            "extreme_dark": np.nonzero(masks["extreme_dark"])[0].tolist(),
            "low_contrast": np.nonzero(masks["low_contrast"])[0].tolist(),
            "potential_artifacts": np.nonzero(masks["artifacts"])[0].tolist(),
        },
    }


def generate_quality_report(
    dataset_config: Any,
    output_path: str | Path = "reports/quality_report.json",
    splits: tuple[str, ...] = ("train", "val", "test"),
) -> Dict[str, Any]:
    report: Dict[str, Any] = {"dataset_stats": {}}
    for split in splits:
        ds = CARSThyroidDataset(dataset_config, split=split)
        metrics = analyze_split(ds.load_images())
        report["dataset_stats"][split] = {"metrics": metrics}
    total = sum(report["dataset_stats"][s]["metrics"]["num_images"] for s in splits)
    issues = {
        k: sum(len(report["dataset_stats"][s]["metrics"]["quality_issues"][k]) for s in splits)
        for k in ("extreme_dark", "low_contrast", "potential_artifacts")
    }
    report["summary"] = {
        "total_images": total,
        "issue_counts": issues,
        "clean_fraction": 1.0 - min(1.0, sum(issues.values()) / max(total, 1)),
    }
    out = Path(output_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    return report
