#!/usr/bin/env python
"""Per-model confusion matrices + ROC/AUC + combined ROC figure from best
checkpoints (reference: scripts/generate_confusion_roc.py:57-340)."""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--models", nargs="+", required=True,
                   help="name=checkpoint pairs, e.g. resnet50=outputs/.../best.ckpt")
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--tta", action="store_true")
    p.add_argument("--output-dir", default="outputs/confusion_roc")
    args = p.parse_args()

    from thyroid_tpu.analysis.evaluation import (
        confusion_roc_figure, evaluate_checkpoint, predict_probs,
        roc_curve_points)
    from thyroid_tpu.config import compose
    from thyroid_tpu.data.pipeline import create_data_loaders
    from thyroid_tpu.models import ModelRegistry
    from thyroid_tpu.training.checkpoint import load_checkpoint

    cfg = compose(overrides=[f"dataset={args.dataset}"])
    pipe = create_data_loaders(cfg.dataset.to_dict(), splits=("test",))["test"]
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    reports, rocs = {}, {}
    for spec in args.models:
        name, _, ckpt = spec.partition("=")
        rep = evaluate_checkpoint(ckpt, {"name": name}, pipe, tta=args.tta)
        model = ModelRegistry.create_model({"name": name})
        variables, _ = load_checkpoint(ckpt)
        probs, labels, _ = predict_probs(model, variables, pipe)
        reports[name] = rep
        rocs[name] = roc_curve_points(probs[:, 1], labels)
        print(name, {k: round(v, 4) for k, v in rep.items()
                     if isinstance(v, float)})
    confusion_roc_figure(reports, rocs, out / "confusion_roc.png")
    (out / "reports.json").write_text(json.dumps(
        {k: {kk: vv for kk, vv in v.items() if kk != "checkpoint_metadata"}
         for k, v in reports.items()}, indent=2, default=str))
    print("wrote", out)


if __name__ == "__main__":
    main()
