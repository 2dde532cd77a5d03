#!/usr/bin/env python
"""Standalone single-experiment runner with arch-aware img_size fixups
(reference: scripts/experiment_runner.py:35-217 — inception→299, vit→224)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("overrides", nargs="*", help="key=value config overrides")
    p.add_argument("--model", default="cnn/resnet50")
    args = p.parse_args()

    from thyroid_tpu.config import compose
    from thyroid_tpu.experiment.manager import ExperimentManager

    overrides = [f"model={args.model}", *args.overrides]
    cfg = compose(overrides=overrides)
    name = str(cfg.model.name)
    # img_size fixups (reference :171-217)
    if "inception" in name:
        cfg.model.img_size = 299
    cfg.dataset.img_size = cfg.model.get("img_size", 224)
    summary = ExperimentManager(cfg).run()
    print(summary if not isinstance(summary, dict) else
          {k: v for k, v in summary.items() if not isinstance(v, list)})


if __name__ == "__main__":
    main()
