#!/usr/bin/env python
"""K-fold knowledge distillation: CNN teacher → DeiT student (reference:
scripts/run_densenet169_deit_tiny_distillation.py:25-118 — per-fold teacher
checkpoints, aggregated mean/std JSON). Teachers are trained first if their
checkpoints are missing."""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--teacher", default="densenet169")
    p.add_argument("--student", default="deit_tiny")
    p.add_argument("--folds", type=int, default=7)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--alpha", type=float, default=0.7)
    p.add_argument("--temperature", type=float, default=4.0)
    p.add_argument("--img-size", type=int, default=0,
                   help="override model/dataset image size (0 = defaults)")
    p.add_argument("--baseline", action="store_true",
                   help="also train the student WITHOUT distillation on the "
                        "same folds, so the summary shows the teacher's "
                        "measurable benefit")
    p.add_argument("--output-dir", default="outputs/distillation")
    args = p.parse_args()

    from thyroid_tpu.config import compose
    from thyroid_tpu.experiment.kfold_experiment import KFoldExperiment
    from thyroid_tpu.training.checkpoint import get_best_checkpoint

    out = Path(args.output_dir)

    # 1. teacher k-fold (skipped for folds whose ckpt already exists)
    size_ov = ([f"model.img_size={args.img_size}",
                f"dataset.img_size={args.img_size}"] if args.img_size else [])
    teacher_cfg = compose(overrides=[
        f"model=cnn/{args.teacher}", f"dataset={args.dataset}",
        f"kfold.num_folds={args.folds}", f"trainer.max_epochs={args.epochs}",
        f"training.epochs={args.epochs}",
    ] + size_ov)
    teacher_cfg["output_dir"] = str(out / "teacher")
    teacher_exp = KFoldExperiment(teacher_cfg)
    teacher_exp.setup()
    fold_ckpts = {}
    for fold in range(1, args.folds + 1):
        ckpt = get_best_checkpoint(
            out / "teacher" / args.teacher / f"fold_{fold}" / "checkpoints",
            args.teacher)
        if ckpt is None:
            res = teacher_exp.run_fold(fold)
            ckpt = res.get("best_checkpoint")
        fold_ckpts[fold] = str(ckpt)
        print(f"teacher fold {fold}: {ckpt}", flush=True)

    # 2. per-fold distillation (fold-matched teacher ckpt)
    fold_results = []
    for fold in range(1, args.folds + 1):
        cfg = compose(overrides=[
            f"model=vit/{args.student}", f"dataset={args.dataset}",
            "kfold.num_folds=1", f"trainer.max_epochs={args.epochs}",
            f"training.epochs={args.epochs}", "training=distillation",
        ] + size_ov)
        cfg["output_dir"] = str(out / f"student_fold_{fold}")
        cfg["distillation"] = {
            "enabled": True, "temperature": args.temperature,
            "alpha": args.alpha, "distillation_type": "soft",
            "progressive": True, "alpha_schedule": [[0, 0.3], [20, 0.5], [40, args.alpha]],
            "teacher_checkpoint": fold_ckpts[fold],
            "teacher_model": {"name": args.teacher},
            "teacher_model_name": args.teacher,
        }
        exp = KFoldExperiment(cfg)
        exp.setup()
        # fold split files live in the dataset's split_dir (the experiment
        # resolves it that way now); the teacher phase above generated the
        # full rotation there, so fold>1 resolves even with num_folds=1
        result = exp.run_fold(fold)
        result["teacher_checkpoint"] = fold_ckpts[fold]
        fold_results.append(result)
        print(f"student fold {fold}: acc={result.get('test_acc')}", flush=True)

    # 3. optional no-teacher baseline: same student, same folds, plain CE —
    # the delta vs the distilled runs is the teacher's measurable benefit
    baseline_results = []
    if args.baseline:
        for fold in range(1, args.folds + 1):
            # training=vit, not the cnn default: the baseline must get the
            # same-quality recipe (lr 1e-4, warmup, label smoothing) or the
            # distillation gain is inflated by an unfair comparison
            cfg = compose(overrides=[
                f"model=vit/{args.student}", f"dataset={args.dataset}",
                "kfold.num_folds=1", f"trainer.max_epochs={args.epochs}",
                f"training.epochs={args.epochs}", "training=vit",
            ] + size_ov)
            cfg["output_dir"] = str(out / f"baseline_fold_{fold}")
            exp = KFoldExperiment(cfg)
            exp.setup()
            result = exp.run_fold(fold)
            baseline_results.append(result)
            print(f"baseline fold {fold}: acc={result.get('test_acc')}",
                  flush=True)

    import numpy as np
    accs = [r["test_acc"] for r in fold_results if "test_acc" in r]
    base_accs = [r["test_acc"] for r in baseline_results if "test_acc" in r]
    summary = {
        "teacher": args.teacher, "student": args.student,
        "folds": fold_results,
        "mean_test_acc": float(np.mean(accs)) if accs else None,
        "std_test_acc": float(np.std(accs)) if accs else None,
    }
    if baseline_results:
        summary["baseline_folds"] = baseline_results
        summary["baseline_mean_test_acc"] = (
            float(np.mean(base_accs)) if base_accs else None)
        summary["baseline_std_test_acc"] = (
            float(np.std(base_accs)) if base_accs else None)
        if accs and base_accs:
            summary["distillation_gain"] = (
                float(np.mean(accs)) - float(np.mean(base_accs)))
    out.mkdir(parents=True, exist_ok=True)
    (out / "distillation_results.json").write_text(
        json.dumps(summary, indent=2, default=str))
    print("mean/std test acc:", summary["mean_test_acc"], summary["std_test_acc"])
    if "distillation_gain" in summary:
        print("baseline mean acc:", summary["baseline_mean_test_acc"],
              "distillation gain:", summary["distillation_gain"])


if __name__ == "__main__":
    main()
