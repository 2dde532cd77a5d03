#!/usr/bin/env python
"""Microbench: fused spatial Swin attention kernel vs the XLA window path.

Measures the full attention sub-block (partition + W-MSA + reverse) on one
Swin stage's shapes, looped on device via lax.scan (CLAUDE.md: host timing
measures dispatch RPC, not the chip). ONE jit program per variant.

Usage: python scripts/bench_swin_attention.py [--stage 1] [--batch 64]
       [--dtype bf16] [--iters 50] [--path fused|xla|both]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

STAGES = {  # swin_tiny @224: (H, C, heads)
    1: (56, 96, 3),
    2: (28, 192, 6),
    3: (14, 384, 12),
    4: (7, 768, 24),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", type=int, default=1)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--dtype", default="bf16")
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--shift", type=int, default=0)
    p.add_argument("--path", default="both")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from thyroid_tpu.models.vit.swin import (
        shift_attention_mask, window_partition, window_reverse)
    from thyroid_tpu.ops.attention import (
        fused_swin_attention, window_attention_reference)

    hw, c, heads = STAGES[args.stage]
    ws = 7 if hw >= 7 else hw
    shift = args.shift
    n = ws * ws
    dh = c // heads
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rs = np.random.RandomState(0)
    qkv = jnp.asarray(rs.randn(args.batch, hw, hw, 3, c), dtype=dt)
    bias = jnp.asarray(rs.randn(heads, n, n) * 0.1, dtype=jnp.float32)
    mask = shift_attention_mask(hw, hw, ws, shift)
    mask_j = jnp.asarray(mask) if mask is not None else None

    def fused_once(x):
        return fused_swin_attention(x, bias, mask_j, window_size=ws,
                                    num_heads=heads)

    def xla_once(x):
        w = window_partition(x[:, :, :, 0], ws)
        q = w.reshape(-1, n, heads, dh).transpose(0, 2, 1, 3)
        k = window_partition(x[:, :, :, 1], ws).reshape(
            -1, n, heads, dh).transpose(0, 2, 1, 3)
        v = window_partition(x[:, :, :, 2], ws).reshape(
            -1, n, heads, dh).transpose(0, 2, 1, 3)
        o = window_attention_reference(q, k, v, bias, mask_j)
        o = o.transpose(0, 2, 1, 3).reshape(-1, n, c)
        return window_reverse(o, ws, hw, hw)

    def loop(fn):
        @jax.jit
        def run(x):
            def body(carry, _):
                y = fn(x + carry.astype(x.dtype) * 1e-6)
                return y.mean().astype(jnp.float32), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                  length=args.iters)
            return out
        return run

    out = {"stage": args.stage, "batch": args.batch, "dtype": args.dtype,
           "shift": shift, "platform": jax.devices()[0].platform}
    for name, fn in [("fused", fused_once), ("xla", xla_once)]:
        if args.path not in (name, "both"):
            continue
        run = loop(fn)
        r = run(qkv)
        jax.block_until_ready(r)  # compile + warm
        t0 = time.perf_counter()
        jax.block_until_ready(run(qkv))
        dt_s = time.perf_counter() - t0
        out[f"{name}_us_per_call"] = round(dt_s / args.iters * 1e6, 1)
    if "fused_us_per_call" in out and "xla_us_per_call" in out:
        out["speedup"] = round(out["xla_us_per_call"] /
                               out["fused_us_per_call"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
