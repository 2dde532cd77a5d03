#!/usr/bin/env python
"""On-chip TRAINING demo across model families — answers BASELINE's
"training time" column (reference: per-model minutes on an RTX 4000 Ada,
scripts/generate_performance_charts.py RESULTS_DATA).

For each family: synthetic 450-image corpus (the reference corpus size),
scan-epoch Trainer (ONE dispatched program per epoch), measured epoch wall
time and train img/s on the real chip, plus the extrapolated full-run time
(reference epoch counts) vs the published minutes.

TPU budget note (CLAUDE.md): one scan-epoch jit program per model; epoch 0
is the compile, epochs 1..N are the measurement.

Usage: python scripts/tpu_train_demo.py [--models swin_tiny resnet50 ...]
           [--epochs 4] [--batch 64] [--out reports/demo_run]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DEFAULT_MODELS = ["resnet50", "densenet121", "efficientnet_b0",
                  "inception_v3", "vit_tiny", "deit_tiny", "swin_tiny"]
# full-run epochs: the reference trains 50 (CNN) / 100-with-early-stop (ViT)
# epochs per fold (configs/training/*.yaml); 50 is the comparison point.
FULL_RUN_EPOCHS = 50


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--models", nargs="*", default=DEFAULT_MODELS)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--img", type=int, default=224)
    p.add_argument("--n-images", type=int, default=450)
    p.add_argument("--out", default="reports/demo_run")
    args = p.parse_args()

    import jax

    from thyroid_tpu.analysis.charts import REFERENCE_RESULTS
    from thyroid_tpu.data import DevicePipeline, generate_corpus_arrays
    from thyroid_tpu.models import ModelRegistry
    from thyroid_tpu.training import Trainer

    imgs, labels = generate_corpus_arrays(n_images=args.n_images, size=512)
    platform = jax.devices()[0].platform
    results = {}
    for name in args.models:
        # inception needs 299² (the reference's experiment_runner img-size
        # fixup — scripts/experiment_runner.py:171-217); everything else 224²
        img = 299 if name.startswith("inception") else args.img
        pipe = DevicePipeline(imgs, labels, batch_size=args.batch,
                              img_size=img, train=True,
                              augmentation_level="medium",
                              quality_preprocessing=False)
        mcfg = {"name": name, "img_size": img, "in_channels": 1,
                "num_classes": 2}
        tcfg = {"epochs": args.epochs, "batch_size": args.batch,
                "optimizer_params": {"lr": 1e-3},
                "scheduler_params": {"name": "cosine", "warmup_epochs": 1},
                "monitor_metric": "val_acc", "monitor_mode": "max",
                "early_stopping_patience": 100}
        trainer = Trainer(ModelRegistry.create_model(mcfg), mcfg, tcfg,
                          {"max_epochs": args.epochs,
                           "enable_checkpointing": False},
                          steps_per_epoch=pipe.steps_per_epoch(),
                          output_dir="/tmp/tpu_train_demo")
        rng = jax.random.PRNGKey(0)
        t0 = time.perf_counter()
        m = trainer.train_epoch(pipe, 0, jax.random.fold_in(rng, 0))
        compile_s = time.perf_counter() - t0
        epoch_times = []
        for e in range(1, args.epochs):
            t0 = time.perf_counter()
            m = trainer.train_epoch(pipe, e, jax.random.fold_in(rng, e))
            epoch_times.append(time.perf_counter() - t0)
        epoch_s = float(np.median(epoch_times)) if epoch_times else compile_s
        n_seen = pipe.steps_per_epoch() * args.batch
        ref = REFERENCE_RESULTS.get(name)
        ref_min = ref[2] if ref and ref[2] else None
        rec = {
            "epoch_s": round(epoch_s, 4),
            "compile_s": round(compile_s, 1),
            "train_img_per_s": round(n_seen / epoch_s, 1),
            "final_train_loss": round(m.get("train_loss", float("nan")), 4),
            "final_train_acc": round(m.get("train_acc", float("nan")), 4),
            "full_run_s_extrapolated": round(
                compile_s + FULL_RUN_EPOCHS * epoch_s, 1),
            "reference_minutes": ref_min,
        }
        if ref_min:
            rec["speedup_vs_reference"] = round(
                ref_min * 60 / rec["full_run_s_extrapolated"], 1)
        results[name] = rec
        print(name, json.dumps(rec), flush=True)
        del trainer, pipe

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    out_path = out_dir / "train_throughput.json"
    if out_path.exists():          # partial re-runs merge into the report
        prior = json.loads(out_path.read_text()).get("models", {})
        results = {**prior, **results}
    payload = {
        "platform": platform,
        "batch_size": args.batch,
        "img_size": args.img,
        "corpus_images": args.n_images,
        "measured_epochs": args.epochs,
        "full_run_epochs_assumed": FULL_RUN_EPOCHS,
        "note": ("scan-epoch Trainer (one dispatched program per epoch), "
                 "bf16 compute, synthetic 450-image corpus; reference "
                 "minutes are the published single-GPU training times. "
                 "epoch_s includes the ~3 s axon-tunnel dispatch+readback "
                 "overhead per epoch (fixed cost, not chip time) — "
                 "steady-state on-chip train img/s is measured by "
                 "scripts/bench_train_throughput.py instead"),
        "models": results,
    }
    out_path.write_text(json.dumps(payload, indent=2))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
