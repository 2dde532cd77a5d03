#!/usr/bin/env python
"""End-to-end throughput benchmark — preprocessed 224×224 images/sec/chip.

Measures the driver's headline metric (BASELINE.json: ≥10,000 preprocessed
224² images/sec/chip, preprocess + inference on device): raw 512×512 uint16
frames → fused on-device preprocess (uint16 coercion → MXU bilinear resize →
per-image bisection-percentile normalisation, fused into one Pallas kernel
on TPU → standardisation) → model forward in bfloat16. Default model:
efficientnet_b0 (measured ~18.1k img/s on the v5e chip); pass --model
swin_tiny for the accuracy flagship (~3.5k img/s with the fused
head-packed Pallas window-attention kernel, on by default on TPU —
docs/DESIGN.md round-2 notes). --quality runs the full quality-aware
pipeline (~3.1k img/s after the round-3 merged dual-grid CLAHE and the
fused median+bilateral stencil kernel — docs/DESIGN.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="efficientnet_b0")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--raw-size", type=int, default=512)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--quality", action="store_true",
                   help="include the full quality-aware pipeline")
    p.add_argument("--quality-chunk", type=int, default=32,
                   help="lax.map chunk for the quality pipeline (bounds "
                        "the artifact-filter shifted-stack intermediates: "
                        "~27 MB/image at 512²)")
    p.add_argument("--dtype", default="bf16")
    p.add_argument("--swin-window", type=int, default=None,
                   help="override Swin window size (e.g. 8: MXU-aligned "
                        "64-token windows as a deliberate deviation from "
                        "the reference's 7)")
    p.add_argument("--quant", default=None, choices=["int8"],
                   help="serve Dense/Conv contractions in int8 (PTQ, "
                        "serving/quantize.py); off by default — the "
                        "headline number stays the exact bf16 model")
    p.add_argument("--carry-raw", action="store_true",
                   help="experiment (VERDICT r4 #7): thread the raw-frame "
                        "chunk through the scan CARRY with an in-carry "
                        "elementwise perturbation, instead of broadcasting "
                        "a scalar carry into the loop-invariant buffer — "
                        "lets XLA alias the frame buffer across iterations "
                        "(targets the ~8.9 ms/iter copy tail in the "
                        "round-4 vit_base trace)")
    args = p.parse_args()

    if args.quality:
        # axon quirk (measured, round 2): a single dispatch running longer
        # than ~1 minute crashes the TPU worker (the pre-rewrite quality
        # pipeline at ~62 ms/image hit it from B·iters ≥ 1024). The CLAHE
        # one-hot rewrite (ops/clahe.py) runs ~3 ms/image, so the default
        # 256×16 dispatch is ~12 s — safe — but cap the total on-device
        # work as a guard; throughput math uses args.iters so the metric
        # stays correct.
        args.iters = min(args.iters, max(1, 8192 // args.batch_size))

    import jax
    import jax.numpy as jnp

    from thyroid_tpu.data.pipeline import prepare_images
    from thyroid_tpu.models.base import create_and_init
    from thyroid_tpu.ops.image import standardize

    mcfg = {"name": args.model, "img_size": args.img_size, "in_channels": 1,
            "num_classes": 2, "dtype": args.dtype}
    if args.swin_window is not None:
        mcfg["window_size"] = args.swin_window
    if args.model.startswith("swin") and args.dtype == "bf16":
        # serving fast path: bf16 attention softmax (halves HBM traffic on
        # the attention tensor; measured +35% on swin_tiny, ≤7e-6 output diff)
        mcfg["params"] = {"attn_softmax_dtype": "bf16"}
    model, variables = create_and_init(mcfg, jax.random.PRNGKey(0))

    # The measurement loop runs ON DEVICE (lax.scan): one dispatch per timing
    # call and a scalar read-back. Host-side per-call timing through a remote
    # TPU tunnel measures RPC latency (~100 ms) and read-back bandwidth, not
    # the chip; a production serving loop keeps dispatch off the step path the
    # same way. A tiny per-iteration carry perturbs the input so no iteration
    # can be CSE'd away.
    def apply_model(variables, x):
        if args.quant == "int8":
            from thyroid_tpu.serving.quantize import int8_serving

            with int8_serving():
                return model.apply(variables, x, train=False)
        return model.apply(variables, x, train=False)

    def one_step(variables, raw):
        x = prepare_images(raw, args.img_size, quality=args.quality,
                           chunk=args.quality_chunk)
        x = standardize(x, (0.5,), (0.5,))
        out = apply_model(variables, x)
        return out[0] if isinstance(out, tuple) else out

    if args.carry_raw:
        # raw frames ride the scan carry: the perturbation is an in-carry
        # elementwise add whose output buffer XLA can alias with the carry
        # (no outer donation — the timing loop reuses the host-side handle;
        # the one copy-in at loop entry is ~0.2 ms at B=128)
        @jax.jit
        def timed_chunk(variables, raw):
            def body(raw, _):
                out = one_step(variables, raw)
                s = (out.astype(jnp.float32).sum() * 1e-30).astype(raw.dtype)
                return raw + s, out.sum()
            _, outs = jax.lax.scan(body, raw, None, length=args.iters)
            return outs.sum()
    else:
        @jax.jit
        def timed_chunk(variables, raw):
            def body(carry, _):
                out = one_step(variables, raw + carry)
                return out.astype(jnp.float32).sum() * 1e-30, out.sum()
            _, outs = jax.lax.scan(body, jnp.float32(0.0), None,
                                   length=args.iters)
            return outs.sum()

    rs = np.random.RandomState(0)
    # uint16-scale raw frames, resident on device (the pipeline keeps the
    # corpus HBM-resident; per-step input is an on-device buffer)
    raw = jax.device_put(jnp.asarray(
        (rs.rand(args.batch_size, args.raw_size, args.raw_size, 1) * 65535)
        .astype(np.float32)))

    np.asarray(timed_chunk(variables, raw))  # compile + warm up
    times = []
    for _ in range(max(args.warmup // 2, 3)):
        t0 = time.perf_counter()
        np.asarray(timed_chunk(variables, raw))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    imgs_per_sec = args.batch_size * args.iters / dt
    tag = args.dtype if args.quant is None else f"{args.dtype}+{args.quant}"
    print(json.dumps({
        "metric": f"preprocess+infer {args.img_size}x{args.img_size} "
                  f"images/sec/chip ({args.model}, {tag})",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / 10000.0, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
