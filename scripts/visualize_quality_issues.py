#!/usr/bin/env python
"""Render problematic images by issue type (reference:
scripts/visualize_quality_issues.py:25-206)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-path", default="data/raw")
    p.add_argument("--output-dir", default="reports/quality_issues")
    p.add_argument("--per-issue", type=int, default=4)
    args = p.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from thyroid_tpu.data.corpus import scan_corpus
    from thyroid_tpu.data.dataset import decode_image
    from thyroid_tpu.ops import quality_issue_masks

    paths, labels, _ = scan_corpus(args.data_path)
    if not paths:
        raise SystemExit(f"no images under {args.data_path}")
    imgs = np.stack([decode_image(p) for p in paths])[..., None]
    masks = {k: np.asarray(v) for k, v in
             quality_issue_masks(jnp.asarray(imgs.astype(np.float32))).items()}

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    for issue, mask in masks.items():
        idx = np.nonzero(mask)[0][: args.per_issue]
        if len(idx) == 0:
            print(f"{issue}: none found")
            continue
        fig, axes = plt.subplots(1, len(idx), figsize=(4 * len(idx), 4))
        for ax, i in zip(np.atleast_1d(axes), idx):
            ax.imshow(imgs[i, ..., 0], cmap="gray")
            ax.set_title(f"{paths[i].name}")
            ax.axis("off")
        fig.suptitle(issue)
        fig.savefig(out / f"{issue}.png", dpi=110, bbox_inches="tight")
        plt.close(fig)
        print(f"{issue}: {int(mask.sum())} images, examples → {out}/{issue}.png")


if __name__ == "__main__":
    main()
