"""Single home for TPU-platform detection.

The axon plugin registers the chip as platform "axon" with device kind
"TPU v5 lite", so matching `jax.default_backend()` alone misses it — the
probe checks platform AND device kind. Compiled Mosaic kernels need a real
TPU; every Pallas call site falls back to interpret mode elsewhere.
"""
from __future__ import annotations

import jax


def is_tpu() -> bool:
    devs = jax.devices()
    if not devs:
        return False
    dev = devs[0]
    blob = f"{dev.platform} {getattr(dev, 'device_kind', '')}".lower()
    return "tpu" in blob
