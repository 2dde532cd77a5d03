#!/usr/bin/env python
"""Offline preprocessing raw → processed PNGs (reference:
scripts/preprocess_images.py — Anscombe :32-37 → CLAHE(0.03, 32×32) :39-62 →
percentile normalise (1,99) :64-79, written as 8-bit PNGs :88-97), executed
batched on device."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", default="data/raw")
    p.add_argument("--output", default="data/processed")
    p.add_argument("--batch-size", type=int, default=32)
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from thyroid_tpu.data.corpus import scan_corpus
    from thyroid_tpu.data.dataset import decode_image
    from thyroid_tpu.ops import adaptive_normalize, anscombe, clahe_uint16

    @jax.jit
    def process(x):
        y = anscombe(x)
        # Anscombe output range ~[1.2, 512]; rescale to uint16 before CLAHE
        y = y / (2.0 * jnp.sqrt(65535.0 + 0.375)) * 65535.0
        y = clahe_uint16(y, clip_limit=0.03, grid=(32, 32))
        return adaptive_normalize(y, percentiles=(1.0, 99.0))

    paths, labels, _ = scan_corpus(args.input)
    if not paths:
        raise SystemExit(f"no images under {args.input}")
    out_root = Path(args.output)
    for start in range(0, len(paths), args.batch_size):
        chunk = paths[start:start + args.batch_size]
        imgs = np.stack([decode_image(p) for p in chunk])[..., None]
        processed = np.asarray(process(jnp.asarray(imgs.astype(np.float32))))
        for path, img in zip(chunk, processed):
            out_dir = out_root / path.parent.name
            out_dir.mkdir(parents=True, exist_ok=True)
            png8 = (np.clip(img[..., 0], 0, 1) * 255).astype(np.uint8)
            cv2.imwrite(str(out_dir / (path.stem + ".png")), png8)
        print(f"processed {min(start + args.batch_size, len(paths))}/{len(paths)}")


if __name__ == "__main__":
    main()
