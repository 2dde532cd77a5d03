#!/usr/bin/env python
"""Per-model confusion matrices + ROC/AUC + combined ROC figure from best
checkpoints (reference: scripts/generate_confusion_roc.py:57-340).

--demo-corpus evaluates on the zoo demo's synthetic_hard corpus, rebuilt
from the exported checkpoint metadata (see run_zoo_kfold_demo.py
--export-checkpoints) — each model scores its fold-1 TEST split, the data
its fold-1 weights never saw. --tta averages the reference's 4 TTA views
(src/data/transforms.py:309 get_tta_transforms).
"""
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
    p.add_argument("--demo-corpus", action="store_true",
                   help="rebuild the zoo demo corpus from checkpoint "
                        "metadata; evaluate each model on its fold's test split")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--tta", action="store_true")
    p.add_argument("--output-dir", default="outputs/confusion_roc")
    args = p.parse_args()

    from thyroid_tpu.analysis.evaluation import (
        binary_report, confusion_roc_figure, predict_probs, roc_curve_points)
    from thyroid_tpu.models import ModelRegistry
    from thyroid_tpu.training.checkpoint import load_checkpoint

    specs = []
    for spec in args.models:
        name, _, ckpt = spec.partition("=")
        specs.append((name, Path(ckpt)))

    if args.demo_corpus:
        from run_ensemble_kfold_evaluation import _demo_fold_pipelines

        meta = json.loads((specs[0][1] / "metadata.json").read_text())
        pipes = _demo_fold_pipelines(meta, int(meta.get("folds", 5)),
                                     args.batch, args.img_size)

        def pipe_for(meta_m):
            return pipes[int(meta_m.get("fold", 1))]
    else:
        from thyroid_tpu.config import compose
        from thyroid_tpu.data.pipeline import create_data_loaders

        cfg = compose(overrides=[f"dataset={args.dataset}"])
        pipe = create_data_loaders(cfg.dataset.to_dict(),
                                   splits=("test",))["test"]

        def pipe_for(meta_m):
            return pipe

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    reports, rocs = {}, {}
    for name, ckpt in specs:
        variables, meta_m = load_checkpoint(ckpt)
        model_cfg = meta_m.get("model_config") or {"name": name}
        model = ModelRegistry.create_model(model_cfg)
        probs, labels, _ = predict_probs(model, variables, pipe_for(meta_m),
                                         tta=args.tta)
        rep = binary_report(probs, labels)
        rep["checkpoint"] = str(ckpt)
        rep["tta"] = bool(args.tta)
        if args.demo_corpus:
            rep["fold"] = int(meta_m.get("fold", 1))
            rep["corpus"] = meta_m.get("corpus", "synthetic_hard")
        reports[name] = rep
        rocs[name] = roc_curve_points(probs[:, 1], labels)
        print(name, {k: round(v, 4) for k, v in rep.items()
                     if isinstance(v, float)})
    confusion_roc_figure(reports, rocs, out / "confusion_roc.png")
    (out / "reports.json").write_text(json.dumps(reports, indent=2,
                                                 default=str))
    print("wrote", out)


if __name__ == "__main__":
    main()
