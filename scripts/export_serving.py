#!/usr/bin/env python
"""Export a trained model to a frozen StableHLO serving bundle.

The bundle (manifest + params.npz + one .stablehlo artifact per batch
bucket) serves without any model code — see thyroid_tpu/serving/export.py.
No reference counterpart (the reference ships raw Lightning checkpoints).

Usage:
  python scripts/export_serving.py --checkpoint runs/.../best --out bundle/
  python scripts/export_serving.py --model swin_tiny --out bundle/ \
      --buckets 1 8 32 [--quality] [--preprocessed]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    p = argparse.ArgumentParser(
        description="Export a model to a StableHLO serving bundle")
    p.add_argument("--checkpoint", default=None,
                   help="Orbax checkpoint dir (uses its model_config)")
    p.add_argument("--model", default=None,
                   help="model name for a fresh-init export (no checkpoint)")
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--out", required=True, help="output bundle directory")
    p.add_argument("--buckets", type=int, nargs="+", default=[1, 8, 32, 128])
    p.add_argument("--quality", action="store_true",
                   help="include the quality-aware preprocess in the graph")
    p.add_argument("--preprocessed", action="store_true",
                   help="inputs are already img_size squares (skip the "
                        "on-device raw 512-square preprocess)")
    args = p.parse_args()
    if (args.checkpoint is None) == (args.model is None):
        p.error("pass exactly one of --checkpoint / --model")

    from thyroid_tpu.serving import InferenceEngine, export_engine

    mcfg = None
    if args.model is not None:
        mcfg = {"name": args.model, "img_size": args.img_size,
                "in_channels": 1, "num_classes": 2}
    engine = InferenceEngine(
        model_config=mcfg, checkpoint=args.checkpoint,
        buckets=args.buckets, quality=args.quality,
        raw_inputs=not args.preprocessed)
    manifest = export_engine(engine, args.out, buckets=args.buckets)
    print(json.dumps({"out": args.out,
                      "buckets": manifest["buckets"],
                      "artifacts": len(manifest["artifacts"])}))


if __name__ == "__main__":
    main()
