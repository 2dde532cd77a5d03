#!/usr/bin/env python
"""Quick-test matrix: every model config through the real experiment manager
at 2 folds × 1 epoch (reference: scripts/run_all_models_quick_test.py:13-71).
Runs in-process (sequential) rather than via subprocesses — on TPU the chip
admits one client at a time, and in-process reuses the compile cache."""
import argparse
import json
import time
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--models", nargs="*", default=None,
                   help="subset like cnn/resnet18 vit/swin_tiny (default: all)")
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--folds", type=int, default=2)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--img-size", type=int, default=0,
                   help="override image size (0 = model default)")
    p.add_argument("--output", default="outputs/quick_test_results.json")
    args = p.parse_args()

    from thyroid_tpu.config import compose, list_model_configs
    from thyroid_tpu.experiment.manager import ExperimentManager

    models = args.models or list_model_configs()
    results = {}
    for option in models:
        t0 = time.time()
        overrides = [
            f"model={option}",
            f"dataset={args.dataset}",
            f"kfold.num_folds={args.folds}",
            f"trainer.max_epochs={args.epochs}",
            f"training.epochs={args.epochs}",
            "trainer.enable_checkpointing=false",
        ]
        if args.img_size:
            overrides += [f"model.img_size={args.img_size}",
                          f"dataset.img_size={args.img_size}"]
        try:
            cfg = compose(overrides=overrides)
            summary = ExperimentManager(cfg).run()
            results[option] = {
                "status": "ok",
                "avg_test_acc": summary.get("avg_test_acc"),
                "folds": summary.get("num_successful_folds"),
                "time_s": round(time.time() - t0, 1),
            }
        except Exception as e:
            results[option] = {"status": "failed", "error": str(e),
                               "time_s": round(time.time() - t0, 1)}
        print(option, "→", results[option], flush=True)
    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    Path(args.output).write_text(json.dumps(results, indent=2))
    failed = [k for k, v in results.items() if v["status"] != "ok"]
    print(f"\n{len(results) - len(failed)}/{len(results)} models passed")
    if failed:
        print("failed:", failed)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
