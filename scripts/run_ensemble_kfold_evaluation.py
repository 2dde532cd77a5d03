#!/usr/bin/env python
"""K-fold weighted-probability ensemble evaluation (reference:
scripts/run_ensemble_kfold_evaluation.py — default weights 0.50/0.25/0.25
:164, sklearn-style sens/spec/ppv/npv :108-124)."""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--members", nargs="+",
                   default=["densenet169", "vit_small", "vit_tiny"])
    p.add_argument("--weights", nargs="+", type=float,
                   default=[0.5, 0.25, 0.25])
    p.add_argument("--checkpoint-root", default="outputs")
    p.add_argument("--folds", type=int, default=7)
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--output", default="outputs/ensemble_kfold_results.json")
    args = p.parse_args()

    from thyroid_tpu.analysis.evaluation import evaluate_ensemble_kfold
    from thyroid_tpu.config import compose
    from thyroid_tpu.data.pipeline import create_data_loaders

    cfg = compose(overrides=[f"dataset={args.dataset}"])
    dataset_cfg = cfg.dataset.to_dict()
    fold_pipelines = {}
    member_specs = []
    root = Path(args.checkpoint_root)
    for name in args.members:
        ckpts = {}
        for fold in range(1, args.folds + 1):
            best = root / name / f"fold_{fold}" / "checkpoints" / f"{name}-best.ckpt"
            if not best.exists():
                raise SystemExit(f"missing checkpoint {best} — train {name} first")
            ckpts[fold] = str(best)
        member_specs.append({"model": {"name": name}, "checkpoints": ckpts})
    for fold in range(1, args.folds + 1):
        dcfg = dict(dataset_cfg)
        dcfg["split_file"] = str(Path(dcfg["split_dir"]) / f"split_fold_{fold}.json")
        fold_pipelines[fold] = create_data_loaders(dcfg, splits=("test",))["test"]
    summary = evaluate_ensemble_kfold(member_specs, fold_pipelines,
                                      weights=args.weights, output_path=args.output)
    print(json.dumps({k: v for k, v in summary.items() if k != "folds"}, indent=2))


if __name__ == "__main__":
    main()
