"""thyroid_tpu — TPU-native (JAX/XLA/Pallas/pjit) framework for CNN-vs-ViT
comparison on CARS thyroid microscopy images.

A ground-up rebuild of the capabilities of gogolB/thyroid-vit-cnn-comparison
(reference mounted at /root/reference) designed TPU-first:

- On-device, fused image preprocessing (resize / gamma / CLAHE / percentile
  normalisation / Anscombe) replacing the reference's per-image CPU cv2
  pipeline (reference: src/data/quality_preprocessing.py).
- One unified flax model zoo behind a registry (reference: src/models/registry.py)
  covering ResNet / DenseNet / EfficientNet / Inception CNNs and
  ViT / DeiT / Swin transformers — no timm dependency.
- A single functional training engine (train-state + composable loss
  strategies) replacing the reference's three LightningModules
  (reference: src/training/lightning_modules.py).
- SPMD data-parallel training over a `jax.sharding.Mesh` (ICI), with optional
  model/fsdp axes — replacing the reference's single-device PL Trainer.
- K-fold / distillation / ablation / all-models experiment orchestration
  (reference: src/experiment/).
- On-device analysis (GradCAM via jax.grad on captured activations,
  attention maps) replacing torch hooks (reference: scripts/generate_vit_gradcam.py).
"""

__version__ = "0.1.0"

import os as _os

# THYROID_PLATFORM=cpu forces the JAX platform even when a site hook pins it
# (some environments register a TPU plugin and override JAX_PLATFORMS).
if _os.environ.get("THYROID_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["THYROID_PLATFORM"])

# Persistent compilation cache: identical programs skip recompilation
# ACROSS processes. On the axon TPU every new jit program costs 1-5 min
# through the remote compile helper (CLAUDE.md), and the sweep scripts
# deliberately run models in fresh processes (RESOURCE_EXHAUSTED retry
# discipline) — without this cache each retry repays every compile.
# TPU-only: XLA:CPU AOT reload warns about machine-feature mismatches
# (potential SIGILL), and CPU compiles are cheap anyway.
# Opt out with THYROID_NO_COMPILE_CACHE=1.
if not _os.environ.get("THYROID_NO_COMPILE_CACHE") and \
        _os.environ.get("THYROID_PLATFORM", "tpu") != "cpu" and \
        _os.environ.get("JAX_PLATFORMS", "tpu") != "cpu":
    import jax as _jax

    _cache_dir = _os.environ.get(
        "THYROID_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "thyroid_jax"))
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # cache every program that took >1s to compile (default threshold
        # only caches "large" ones); axon's floor is minutes, CPU test
        # programs also benefit
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - config names vary across jax
        pass
