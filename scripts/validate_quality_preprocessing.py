#!/usr/bin/env python
"""Visual + statistical validation of the quality pipeline, including the
preprocessing speed benchmark in ms/image at 256² and 512² (reference:
scripts/validate_quality_preprocessing.py:292-321)."""
import argparse
import time
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--output-dir", default="reports/quality_validation")
    p.add_argument("--batch-size", type=int, default=32)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from thyroid_tpu.data.synthetic import generate_corpus_arrays
    from thyroid_tpu.ops import quality_preprocess, quality_issue_masks

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    # statistical validation on a synthetic mixed-quality batch
    imgs, _ = generate_corpus_arrays(n_images=16, size=256)
    x = jnp.asarray(imgs.astype(np.float32))
    masks = {k: np.asarray(v) for k, v in quality_issue_masks(x).items()}
    processed = np.asarray(quality_preprocess(x))
    print("issues detected:", {k: int(v.sum()) for k, v in masks.items()})
    print("mean before/after:", float(np.mean(imgs)), float(processed.mean()))

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(2, 4, figsize=(14, 7))
    for i, ax_pair in enumerate(zip(axes[0], axes[1])):
        ax_pair[0].imshow(imgs[i, ..., 0], cmap="gray"); ax_pair[0].axis("off")
        ax_pair[1].imshow(processed[i, ..., 0], cmap="gray"); ax_pair[1].axis("off")
    axes[0][0].set_title("raw"); axes[1][0].set_title("processed")
    fig.savefig(out / "before_after.png", dpi=110, bbox_inches="tight")

    # speed benchmark — batched on device, scan-amortised dispatch
    for size in (256, 512):
        imgs, _ = generate_corpus_arrays(n_images=args.batch_size, size=size)
        xb = jax.device_put(jnp.asarray(imgs.astype(np.float32)))

        @jax.jit
        def chunk(x):
            def body(c, _):
                y = quality_preprocess(x + c)
                return c * 0 + y.sum() * 1e-30, y.sum()
            _, outs = jax.lax.scan(body, jnp.float32(0), None, length=8)
            return outs.sum()

        np.asarray(chunk(xb))  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(chunk(xb))
            ts.append(time.perf_counter() - t0)
        ms_per_image = float(np.median(ts)) / 8 / args.batch_size * 1000
        print(f"quality preprocess {size}x{size}: {ms_per_image:.3f} ms/image "
              f"({1000/ms_per_image:.0f} img/s)")


if __name__ == "__main__":
    main()
