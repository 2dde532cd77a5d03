#!/usr/bin/env python
"""Fused Swin attention TRAINING micro-bench: fwd+bwd, Pallas vs XLA.

Validates that the custom_vjp backward kernel (ops/attention.py
_swin_bwd_kernel) compiles under Mosaic on the real chip and measures the
end-to-end value_and_grad cost of one attention sub-block against the plain
XLA formulation (partition → W-MSA → reverse).

TPU budget note (CLAUDE.md): exactly TWO jit programs (one per path), each
looping on device via lax.scan; host timing wraps a single dispatch.

Usage: python scripts/bench_swin_grad.py [--stage 1] [--batch 64] [--iters 20]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# swin_tiny stage geometry at 224²: (H, W, C, heads)
STAGES = {
    1: (56, 56, 96, 3),
    2: (28, 28, 192, 6),
    3: (14, 14, 384, 12),
    4: (7, 7, 768, 24),
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--stage", type=int, default=1, choices=(1, 2, 3, 4))
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--shift", type=int, default=0)
    p.add_argument("--dtype", default="bf16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from thyroid_tpu.models.vit.swin import (
        shift_attention_mask, window_partition, window_reverse)
    from thyroid_tpu.ops.attention import (
        fused_swin_attention, window_attention_reference)

    hh, ww, c, heads = STAGES[args.stage]
    ws = 7
    n, dh = ws * ws, c // heads
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rs = np.random.RandomState(0)
    qkv = jnp.asarray(rs.randn(args.batch, hh, ww, 3, c), dtype=dt)
    bias = jnp.asarray(rs.randn(heads, n, n) * 0.1, dtype=jnp.float32)
    wvec = jnp.asarray(rs.randn(args.batch, hh, ww, c), dtype=jnp.float32)
    mask = shift_attention_mask(hh, ww, ws, args.shift)
    mask_j = jnp.asarray(mask) if mask is not None else None

    def loss_pallas(qkv, bias):
        out = fused_swin_attention(qkv, bias, mask_j, window_size=ws,
                                   num_heads=heads)
        return (out.astype(jnp.float32) * wvec).sum()

    def loss_xla(qkv, bias):
        def part(t):
            return window_partition(t, ws).reshape(
                -1, n, heads, dh).transpose(0, 2, 1, 3)

        ref = window_attention_reference(
            part(qkv[:, :, :, 0]), part(qkv[:, :, :, 1]),
            part(qkv[:, :, :, 2]), bias, mask_j)
        ref = window_reverse(ref.transpose(0, 2, 1, 3).reshape(-1, n, c),
                             ws, hh, ww)
        return (ref.astype(jnp.float32) * wvec).sum()

    def timed_program(loss_fn):
        @jax.jit
        def prog(qkv, bias):
            def body(carry, _):
                l, (dq, db) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                    qkv + carry.astype(qkv.dtype), bias)
                keep = dq.astype(jnp.float32).sum() * 1e-30 \
                    + db.sum() * 1e-30
                return keep, l + keep
            _, ls = jax.lax.scan(body, jnp.float32(0.0), None,
                                 length=args.iters)
            return ls.sum()
        return prog

    out = {"stage": args.stage, "batch": args.batch, "shift": args.shift,
           "dtype": args.dtype, "platform": jax.devices()[0].platform}
    vals = {}
    for name, fn in (("pallas", loss_pallas), ("xla", loss_xla)):
        prog = timed_program(fn)
        v = np.asarray(prog(qkv, bias))  # compile + warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(prog(qkv, bias))
            times.append(time.perf_counter() - t0)
        us = float(np.median(times)) / args.iters * 1e6
        out[f"{name}_us_per_iter"] = round(us, 1)
        vals[name] = float(v)
    out["rel_value_diff"] = abs(vals["pallas"] - vals["xla"]) / \
        max(abs(vals["xla"]), 1e-9)
    out["speedup_pallas_over_xla"] = round(
        out["xla_us_per_iter"] / out["pallas_us_per_iter"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
