"""Depthwise convolution as shifted multiply-accumulates.

MEASURED NEGATIVE RESULT (v5e, round 2): wired into every MBConv depthwise
stage, bench.py efficientnet_b0 bf16 B=256 drops 16.7k -> 4.1k img/s.
XLA's depthwise conv emitter beats this unrolled slice-MAC formulation ~4x
end-to-end even though the profiler attributes most device time to it —
the k² strided-slice reads defeat the emitter's batch-in-lanes locality.
Kept opt-in (`model.dw_shift_conv: true`) with full correctness tests;
don't re-try this decomposition, revisit only as a Pallas kernel with an
explicit (W sublanes, C lanes) sliding-window accumulator.

Why it was tried: the round-2 HLO/profile of the headline bench
(scripts/profile_bench.py, efficientnet_b0 bf16 B=256 on v5e) attributed
~9.3 of the program's ~14.6 ms/iter device time to the 16 depthwise
`conv_general_dilated` ops — XLA lowers them with the
`EmitDepthwiseAllBatchInLanes` emitter (batch in lanes, channels serial),
which runs several times slower than the tensors' HBM roofline. A depthwise
conv is just k² per-channel scalar multiplies of shifted views, so this
module expresses it that way: XLA fuses the k² static strided slices +
multiply-adds into ONE loop fusion in the natural (W sublanes, C lanes)
layout, with f32 accumulation like a real conv.

Numerics: inputs/kernel are used in the caller's compute dtype (bf16 on the
bench path) and products accumulate in f32 — the same contract as XLA's
bf16 conv. Results differ from conv_general_dilated only by f32 reduction
order (≤1 ulp-scale reassociation).

Reference anchor: the depthwise stages of EfficientNet MBConv blocks
(reference: src/models/cnn/efficientnet.py delegates to timm's
efficientnet_b0..b3 — depthwise_conv2d in every inverted residual).
"""
from __future__ import annotations

import jax.numpy as jnp


def shift_depthwise_conv(
    x: jnp.ndarray,
    w: jnp.ndarray,
    strides: int = 1,
    padding: int | None = None,
) -> jnp.ndarray:
    """Depthwise conv via k² shifted slices. x: (B, H, W, C); w: (kh, kw, 1, C)
    (flax nn.Conv feature_group_count=C kernel layout); symmetric `padding`
    (default k//2, the torch-symmetric choice used across the CNN zoo).
    → (B, Ho, Wo, C) in x.dtype, f32-accumulated."""
    kh, kw = int(w.shape[0]), int(w.shape[1])
    if padding is None:
        padding = kh // 2
    b, h, ww_, c = x.shape
    s = int(strides)
    ho = (h + 2 * padding - kh) // s + 1
    wo = (ww_ + 2 * padding - kw) // s + 1
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    wk = w.reshape(kh, kw, c)
    acc = None
    for i in range(kh):
        for j in range(kw):
            sl = xp[:, i:i + s * (ho - 1) + 1:s, j:j + s * (wo - 1) + 1:s, :]
            term = sl.astype(jnp.float32) * wk[i, j].astype(jnp.float32)
            acc = term if acc is None else acc + term
    return acc.astype(x.dtype)
