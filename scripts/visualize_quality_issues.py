#!/usr/bin/env python
"""Render problematic images by issue type, analyze their intensity
patterns, and propose quality-stratified splits (reference:
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

        # intensity-pattern analysis per issue (reference :92-165)
        all_idx = np.nonzero(mask)[0][:50]
        if len(all_idx) < 2:
            continue
        sel = imgs[all_idx, ..., 0].reshape(len(all_idx), -1)
        means, stds = sel.mean(1), sel.std(1)
        colors = ["green" if labels[i] == 0 else "red" for i in all_idx]
        fig, axes = plt.subplots(2, 2, figsize=(12, 9))
        fig.suptitle(f"{issue} — intensity analysis")
        for row, lab in zip(sel[:30], colors[:30]):
            axes[0, 0].hist(row[::37], bins=50, alpha=0.12, color=lab,
                            density=True)
        axes[0, 0].set_title("intensity distributions")
        axes[0, 1].scatter(means, stds, c=colors, alpha=0.6)
        axes[0, 1].set_xlabel("mean")
        axes[0, 1].set_ylabel("std")
        axes[0, 1].set_title("mean vs std")
        mins, maxs = sel.min(1), sel.max(1)
        for i in range(len(all_idx)):
            axes[1, 0].plot([i, i], [mins[i], maxs[i]], color=colors[i],
                            alpha=0.5, lw=2)
        axes[1, 0].set_title("min–max ranges")
        axes[1, 1].axis("off")
        lab_arr = labels[all_idx]
        txt = []
        for cls, name in ((0, "normal"), (1, "cancerous")):
            m = means[lab_arr == cls]
            if len(m):
                txt.append(f"{name} (n={len(m)}): mean {m.mean():.1f} "
                           f"± {m.std():.1f}, range [{m.min():.1f}, {m.max():.1f}]")
        axes[1, 1].text(0.05, 0.5, "\n".join(txt), fontsize=11,
                        family="monospace", va="center")
        fig.savefig(out / f"{issue}_analysis.png", dpi=110,
                    bbox_inches="tight")
        plt.close(fig)

    # quality-stratified split proposal (reference :167-206): spread each
    # issue class proportionally across train/val/test
    import json

    rs = np.random.RandomState(42)
    any_issue = np.zeros(len(paths), dtype=bool)
    proposal = {"train": [], "val": [], "test": []}
    for issue, mask in list(masks.items()) + [("clean", None)]:
        idx = np.nonzero(~any_issue)[0] if issue == "clean" \
            else np.nonzero(np.asarray(mask) & ~any_issue)[0]
        if issue != "clean":
            any_issue |= np.asarray(mask)
        idx = rs.permutation(idx)
        n = len(idx)
        n_test, n_val = int(n * 0.15), int(n * 0.15)
        proposal["test"] += idx[:n_test].tolist()
        proposal["val"] += idx[n_test:n_test + n_val].tolist()
        proposal["train"] += idx[n_test + n_val:].tolist()
    with open(out / "quality_aware_split_proposal.json", "w") as f:
        json.dump({k: sorted(v) for k, v in proposal.items()}, f, indent=1)
    print("quality-aware split proposal →",
          out / "quality_aware_split_proposal.json",
          {k: len(v) for k, v in proposal.items()})


if __name__ == "__main__":
    main()
