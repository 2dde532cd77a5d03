#!/usr/bin/env python
"""Per-op device-time profile of the bench.py program (or any model's
serving loop) on the real chip.

Runs the same one-program lax.scan loop as bench.py under a jax.profiler
trace, then parses the trace proto for per-fusion device times and prints
the top-K ops with their share of an iteration. This is the round-2
profiling recipe from docs/DESIGN.md made repeatable.

Usage:  python scripts/profile_bench.py --model efficientnet_b0 [--iters 8]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def parse_trace(log_dir: str, iters: int):
    """Sum device-track event durations by op name from the chrome trace."""
    paths = sorted(glob.glob(
        os.path.join(log_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device tracks: pid whose process_name metadata mentions TPU/device XLA
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "").lower()
            if "tpu" in name or "/device" in name or "xla" in name:
                device_pids.add(e["pid"])
    per_op = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        args_name = e.get("args", {}).get("long_name", "") or name
        dur = float(e.get("dur", 0.0))  # microseconds
        per_op[name if len(name) < 120 else name[:120]] += dur
        total += dur
    return per_op, total


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="efficientnet_b0")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--raw-size", type=int, default=512)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--dtype", default="bf16")
    p.add_argument("--quality", action="store_true")
    p.add_argument("--aug", default=None,
                   choices=["light", "medium", "heavy", "vit"],
                   help="profile the augmentation ladder (light/medium/"
                        "heavy/vit) instead of a model's serving loop")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--logdir", default="/tmp/thyroid_profile")
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from thyroid_tpu.data.pipeline import prepare_images
    from thyroid_tpu.models.base import create_and_init
    from thyroid_tpu.ops.image import standardize

    if args.aug:
        # Augmentation-ladder mode: the scan body is one train_augment /
        # vit_augment call on a [0,1] NHWC batch at --img-size (the shape
        # the training engine feeds it). XLA op metadata carries the jax
        # scope names, so the per-fusion table attributes time to ladder
        # stages (elastic / rotation / microscopy / randaugment) directly.
        from thyroid_tpu.ops.augment import train_augment, vit_augment

        @jax.jit
        def timed_chunk(variables, raw):
            def body(carry, i):
                key = jax.random.fold_in(jax.random.PRNGKey(0), i)
                x = raw + carry
                out = (vit_augment(x, key) if args.aug == "vit"
                       else train_augment(x, key, args.aug))
                return out.astype(jnp.float32).mean() * 1e-30, out.sum()
            _, outs = jax.lax.scan(body, jnp.float32(0.0),
                                   jnp.arange(args.iters))
            return outs.sum()

        rs = np.random.RandomState(0)
        raw = jax.device_put(jnp.asarray(
            rs.rand(args.batch_size, args.img_size, args.img_size, 1)
            .astype(np.float32)))
        variables = None
    else:
        mcfg = {"name": args.model, "img_size": args.img_size,
                "in_channels": 1, "num_classes": 2, "dtype": args.dtype}
        if args.model.startswith("swin") and args.dtype == "bf16":
            mcfg["params"] = {"attn_softmax_dtype": "bf16"}
        model, variables = create_and_init(mcfg, jax.random.PRNGKey(0))

        def one_step(variables, raw):
            x = prepare_images(raw, args.img_size, quality=args.quality)
            x = standardize(x, (0.5,), (0.5,))
            out = model.apply(variables, x, train=False)
            return out[0] if isinstance(out, tuple) else out

        @jax.jit
        def timed_chunk(variables, raw):
            def body(carry, _):
                out = one_step(variables, raw + carry)
                return out.astype(jnp.float32).sum() * 1e-30, out.sum()
            _, outs = jax.lax.scan(body, jnp.float32(0.0), None,
                                   length=args.iters)
            return outs.sum()

        rs = np.random.RandomState(0)
        raw = jax.device_put(jnp.asarray(
            (rs.rand(args.batch_size, args.raw_size, args.raw_size, 1)
             * 65535).astype(np.float32)))

    np.asarray(timed_chunk(variables, raw))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(timed_chunk(variables, raw))
    wall = time.perf_counter() - t0

    import shutil
    shutil.rmtree(args.logdir, ignore_errors=True)
    jax.profiler.start_trace(args.logdir)
    np.asarray(timed_chunk(variables, raw))
    jax.profiler.stop_trace()

    per_op, total = parse_trace(args.logdir, args.iters)
    per_iter_us = total / args.iters
    print(f"\nwall/iter {wall / args.iters * 1e3:.2f} ms   "
          f"device-op time/iter {per_iter_us / 1e3:.2f} ms   "
          f"({args.batch_size * args.iters / wall:.0f} img/s wall)")
    print(f"{'us/iter':>10}  {'share':>6}  op")
    for name, dur in per_op.most_common(args.top):
        print(f"{dur / args.iters:>10.0f}  {dur / total:>6.1%}  {name}")


if __name__ == "__main__":
    sys.exit(main())
