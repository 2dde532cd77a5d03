#!/usr/bin/env python
"""On-chip TRAINING throughput (img/s) for one model — fwd+bwd+AdamW.

Measures the production step path (per-step Python dispatch included, as in
Trainer.train_epoch). `--sync` emulates the round-1 engine's per-step host
synchronisation (float(loss) every step) to quantify the cost it added; the
default path keeps metric state device-resident (engine.py train_epoch).

TPU budget note (CLAUDE.md): ONE jit program (the train step); compile is
excluded from timing by a warmup step.

Usage: python scripts/bench_train_throughput.py --model efficientnet_b0 \
           --batch 256 --steps 30 [--img 224] [--sync] [--compare]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="efficientnet_b0")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--img", type=int, default=224)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--sync", action="store_true",
                   help="force a host sync every step (round-1 behaviour)")
    p.add_argument("--compare", action="store_true",
                   help="measure both synced and non-synced in one process")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from thyroid_tpu.models import ModelRegistry
    from thyroid_tpu.training import Trainer
    from thyroid_tpu.training.metrics import zero_metric_state

    mcfg = {"name": args.model, "img_size": args.img, "in_channels": 1,
            "num_classes": 2}
    tcfg = {"epochs": 1, "batch_size": args.batch,
            "optimizer_params": {"lr": 1e-3}, "scheduler_params": None,
            "monitor_metric": "val_acc", "monitor_mode": "max",
            "early_stopping_patience": 50}
    trainer = Trainer(ModelRegistry.create_model(mcfg), mcfg, tcfg,
                      {"max_epochs": 1, "enable_checkpointing": False},
                      steps_per_epoch=args.steps, output_dir="/tmp/bench_train")

    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(args.batch, args.img, args.img, 1)
                         .astype(np.float32) * 2 - 1)
    labels = jnp.asarray(np.arange(args.batch, dtype=np.int32) % 2)
    weights = jnp.ones((args.batch,), jnp.float32)
    rng = jax.random.PRNGKey(0)
    alpha = jnp.float32(0.0)

    def run(n_steps: int, sync: bool) -> float:
        mstate = zero_metric_state()
        # warmup/compile
        state, mstate, s1 = trainer._train_step(
            trainer.state, mstate, images, labels, weights, rng, alpha)
        np.asarray(s1)
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, mstate, s1 = trainer._train_step(
                state, mstate, images, labels, weights,
                jax.random.fold_in(rng, i), alpha)
            if sync:
                float(mstate["loss_sum"])  # round-1 per-step host round-trip
        # a VALUE readback, not block_until_ready: under the axon tunnel
        # block_until_ready can resolve on the remote buffer handle before
        # the compute chain drains, inflating async numbers ~10×
        np.asarray(s1)
        dt = time.perf_counter() - t0
        trainer.state = state  # keep donation chain valid across runs
        return args.batch * n_steps / dt

    results = {}
    modes = [("synced", True), ("async", False)] if args.compare else \
        [("synced" if args.sync else "async", args.sync)]
    for name, sync in modes:
        results[name] = run(args.steps, sync)
    out = {
        "metric": f"train img/s/chip ({args.model} bf16 fwd+bwd+adamw, B={args.batch})",
        **{f"{k}_img_per_s": round(v, 1) for k, v in results.items()},
        "platform": jax.devices()[0].platform,
    }
    if len(results) == 2:
        out["speedup_async_over_synced"] = round(
            results["async"] / results["synced"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
