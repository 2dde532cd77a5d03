#!/usr/bin/env python
"""Sequential EfficientNet B0–B3 k-fold experiments with a project-log update
(reference: scripts/run_efficientnet_experiments.py:51-242)."""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variants", nargs="*",
                   default=["efficientnet_b0", "efficientnet_b1",
                            "efficientnet_b2", "efficientnet_b3"])
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--folds", type=int, default=5)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--log", default="outputs/efficientnet_project_log.json")
    args = p.parse_args()

    from thyroid_tpu.config import compose
    from thyroid_tpu.experiment.manager import ExperimentManager

    log = {}
    for variant in args.variants:
        t0 = time.time()
        cfg = compose(overrides=[
            f"model=cnn/{variant}", f"dataset={args.dataset}",
            f"kfold.num_folds={args.folds}",
            f"trainer.max_epochs={args.epochs}",
            f"training.epochs={args.epochs}",
        ])
        summary = ExperimentManager(cfg).run()
        log[variant] = {
            "avg_test_acc": summary.get("avg_test_acc"),
            "std_test_acc": summary.get("std_test_acc"),
            "avg_test_auc": summary.get("avg_test_auc"),
            "wall_minutes": round((time.time() - t0) / 60, 1),
        }
        print(variant, "→", log[variant], flush=True)
    Path(args.log).parent.mkdir(parents=True, exist_ok=True)
    Path(args.log).write_text(json.dumps(log, indent=2))


if __name__ == "__main__":
    main()
