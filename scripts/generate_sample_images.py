#!/usr/bin/env python
"""Sample/statistics figures raw vs processed (reference:
scripts/generate_sample_cars_images.py:28-527)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-path", default="data/raw")
    p.add_argument("--output-dir", default="reports/samples")
    args = p.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from thyroid_tpu.analysis.charts import (visualize_image_statistics,
                                             visualize_samples)
    from thyroid_tpu.data.corpus import scan_corpus
    from thyroid_tpu.data.dataset import decode_image
    from thyroid_tpu.ops import quality_preprocess

    paths, labels, _ = scan_corpus(args.data_path)
    if not paths:
        raise SystemExit(f"no images under {args.data_path}")
    imgs = np.stack([decode_image(p) for p in paths[:32]])[..., None]
    labels = labels[:32]
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    visualize_samples(imgs, labels, output_path=out / "samples_raw.png")
    processed = np.asarray(quality_preprocess(jnp.asarray(imgs.astype(np.float32))))
    visualize_samples(processed.astype(np.uint16), labels,
                      output_path=out / "samples_processed.png")
    visualize_image_statistics(imgs, labels, out / "statistics.png")
    print("wrote figures to", out)


if __name__ == "__main__":
    main()
