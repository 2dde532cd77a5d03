#!/usr/bin/env python
"""Sample/feature/intensity figures raw vs processed (reference:
scripts/generate_sample_cars_images.py:28-649 — sample grids, feature
comparison, intensity distributions, per-stage preprocessing comparison,
dataset overview)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-path", default="data/raw")
    p.add_argument("--output-dir", default="reports/samples")
    p.add_argument("--n", type=int, default=32)
    args = p.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from thyroid_tpu.analysis.charts import (
        plot_class_distribution, visualize_image_statistics,
        visualize_samples)
    from thyroid_tpu.analysis.figures import (
        create_feature_comparison, create_intensity_distribution_plot,
        create_preprocessing_comparison, create_sample_grid)
    from thyroid_tpu.data.corpus import scan_corpus
    from thyroid_tpu.data.dataset import decode_image
    from thyroid_tpu.ops import quality_preprocess

    paths, labels, _ = scan_corpus(args.data_path)
    if not paths:
        raise SystemExit(f"no images under {args.data_path}")
    # interleave classes so every figure sees both
    order = np.argsort(labels, kind="stable")
    half = len(order) // 2
    sel = np.empty(len(order), dtype=int)
    sel[0::2] = order[:half + len(order) % 2]
    sel[1::2] = order[half + len(order) % 2:]
    sel = sel[: args.n]
    imgs = np.stack([decode_image(paths[i]) for i in sel])[..., None]
    labels = np.asarray(labels)[sel]
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    processed = np.asarray(quality_preprocess(
        jnp.asarray(imgs.astype(np.float32))))
    visualize_samples(imgs, labels, output_path=out / "samples_raw.png")
    visualize_samples(processed.astype(np.uint16), labels,
                      output_path=out / "samples_processed.png")
    visualize_image_statistics(imgs, labels, out / "statistics.png")
    plot_class_distribution(labels, out / "class_distribution.png")
    create_sample_grid(imgs, processed, labels,
                       output_path=out / "sample_grid_raw_vs_processed.png")
    create_feature_comparison(imgs[:16], processed[:16],
                              output_path=out / "feature_comparison.png")
    create_intensity_distribution_plot(
        imgs, processed, labels, output_path=out / "intensity_distributions.png")
    create_preprocessing_comparison(
        imgs[0], output_path=out / "preprocessing_stages.png")
    n_figs = len(list(out.glob("*.png")))
    print(f"wrote {n_figs} figures to {out}")


if __name__ == "__main__":
    main()
