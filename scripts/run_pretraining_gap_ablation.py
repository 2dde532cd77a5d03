#!/usr/bin/env python
"""CNN-vs-ViT from-scratch ablation across corpus difficulty (VERDICT r3
item #1, measured-ablation arm).

The reference's headline ordering (Swin-Tiny 94.12% > ResNet50 91.18%,
BASELINE.md) rests on ImageNet-pretrained weights: its sweep forces
pretrained=true (reference: src/experiment/
all_models_full_kfold_experiment.py:100-131) and fine-tunes. No pretrained
weights are downloadable in this environment, so the zoo demo trains from
scratch — where CNN inductive bias wins on a 450-image corpus. This script
QUANTIFIES that: it trains a CNN/ViT pair from scratch at several corpus
difficulty levels in ONE process (the stacked program is compiled once per
model and reused across difficulties — same shapes), writing
reports/demo_run/pretraining_gap_ablation.json.

Usage: python scripts/run_pretraining_gap_ablation.py \
           [--models resnet50 swin_tiny] [--difficulties 0.45 0.65 0.85]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from run_zoo_kfold_demo import rotating_folds  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--models", nargs="*", default=["resnet50", "swin_tiny"])
    p.add_argument("--difficulties", nargs="*", type=float,
                   default=[0.45, 0.65, 0.85])
    p.add_argument("--folds", type=int, default=5)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--vit-epochs", type=int, default=100)
    p.add_argument("--patience", type=int, default=8)
    p.add_argument("--transformer-patience", type=int, default=30)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--n-images", type=int, default=450)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--label-noise", type=float, default=0.05)
    p.add_argument("--ema-decay", type=float, default=0.99)
    p.add_argument("--out", default="reports/demo_run")
    args = p.parse_args()

    import jax

    from thyroid_tpu.data import DevicePipeline, generate_corpus_arrays
    from thyroid_tpu.training.stacked import StackedKFoldTrainer

    out_path = Path(args.out) / "pretraining_gap_ablation.json"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    result = {}
    if out_path.exists():
        try:
            result = json.loads(out_path.read_text())
        except Exception:
            result = {}
    result["_meta"] = {
        "platform": jax.devices()[0].platform,
        "question": "how much of the reference's transformers-beat-CNNs "
                    "ordering is ImageNet pretraining (unavailable here) "
                    "vs architecture? From-scratch CNN vs ViT across "
                    "corpus difficulty.",
        "folds": args.folds, "batch": args.batch,
        "n_images": args.n_images, "label_noise": args.label_noise,
        "reference": "src/experiment/all_models_full_kfold_experiment.py"
                     ":100-131 forces pretrained=true",
    }

    # model-major order: one stacked program per model, corpora swapped
    # under it (identical shapes -> no recompile across difficulties)
    for name in args.models:
        is_tf = name.startswith(("vit", "deit", "swin"))
        epochs = args.vit_epochs if is_tf else args.epochs
        mcfg = {"name": name, "img_size": args.img_size, "in_channels": 1,
                "num_classes": 2}
        tcfg = {"epochs": epochs, "batch_size": args.batch,
                "optimizer_params": {"lr": 1e-4 if is_tf else 3e-4,
                                     "weight_decay": 1e-5},
                "scheduler_params": {"scheduler_type": "cosine",
                                     "warmup_epochs": 5 if is_tf else 2},
                "monitor_metric": "val_acc", "monitor_mode": "max",
                "early_stopping_patience": (args.transformer_patience
                                            if is_tf else args.patience)}
        if is_tf:
            tcfg.update(label_smoothing=0.1, layer_decay=0.9,
                        mixup_alpha=0.8, cutmix_alpha=1.0, mixup_prob=0.5)
            if args.ema_decay:
                tcfg["ema_decay"] = args.ema_decay
        kw = (dict(augment_mode="vit",
                   vit_aug_params={"use_randaugment": True,
                                   "use_patch_quality": True,
                                   "randaugment_n": 2,
                                   "randaugment_m": 9.0},
                   augmentation_level="medium")
              if is_tf else dict(augmentation_level="medium"))
        st = None
        for difficulty in args.difficulties:
            imgs, labels = generate_corpus_arrays(
                n_images=args.n_images, size=args.size,
                difficulty=difficulty, label_noise=args.label_noise)
            folds = rotating_folds(labels, args.folds)
            tr = [DevicePipeline(imgs[ti], labels[ti], batch_size=args.batch,
                                 img_size=args.img_size,
                                 quality_preprocessing=True, train=True, **kw)
                  for ti, _, _ in folds]
            va = [DevicePipeline(imgs[vi], labels[vi], batch_size=args.batch,
                                 img_size=args.img_size,
                                 quality_preprocessing=True, train=False)
                  for _, vi, _ in folds]
            te = [DevicePipeline(imgs[tei], labels[tei],
                                 batch_size=args.batch,
                                 img_size=args.img_size,
                                 quality_preprocessing=True, train=False)
                  for _, _, tei in folds]
            t0 = time.time()
            try:
                if st is None:
                    st = StackedKFoldTrainer(
                        mcfg, tcfg,
                        {"max_epochs": epochs, "enable_checkpointing": False,
                         "deterministic": True, "precision": "bf16"},
                        tr, va, test_pipelines=te,
                        output_dir=f"/tmp/ablation/{name}")
                else:
                    # same shapes: reuse the compiled stacked programs,
                    # fresh fold states (StackedKFoldTrainer.reset)
                    st.reset(tr, va, test_pipelines=te)
                rows = st.fit()
                accs = [r["test_acc"] for r in rows if "test_acc" in r]
                rec = {"avg_accuracy": float(np.mean(accs)),
                       "std_accuracy": float(np.std(accs)),
                       "epochs_trained": len(rows[0]["history"]),
                       "wall_minutes": round((time.time() - t0) / 60, 2)}
            except Exception as e:
                rec = {"error": f"{type(e).__name__}: {e}",
                       "wall_minutes": round((time.time() - t0) / 60, 2)}
            result.setdefault(name, {})[f"difficulty_{difficulty}"] = rec
            out_path.write_text(json.dumps(result, indent=2, default=str))
            print(f"{name} @ difficulty {difficulty}: "
                  f"{rec.get('avg_accuracy')} ±{rec.get('std_accuracy')} "
                  f"({rec['wall_minutes']}min) {rec.get('error', '')}",
                  flush=True)

    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
