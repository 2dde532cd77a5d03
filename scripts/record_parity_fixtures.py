#!/usr/bin/env python
"""Record model-parity fixtures (SURVEY §7 "numeric parity ±0.5%").

Two fixture kinds, both consumed by tests/unit/test_golden_parity.py:

1. `--golden` — self-golden logits for the model zoo: fixed-seed init +
   fixed input → logits, saved to tests/fixtures/golden/{name}.npz. These
   pin the zoo's forward math against refactor drift (e.g. a kernel default
   change silently altering outputs).

2. `--torch-weights` — REAL pretrained-weight parity fixtures. Requires
   torchvision/timm (NOT shipped in this image and there is no egress;
   run this in an environment that has them). For each family it loads the
   real pretrained torch model, records its state_dict (.pt) and its logits
   on the fixed input, to tests/fixtures/torch_parity/. The consuming test
   then imports the weights through models/import_torch.py and asserts
   logits parity — the strongest model-level oracle, torch-free at test
   time once fixtures exist.

Reference anchor: the published accuracies assume timm/torchvision
pretrained warm starts (/root/reference/src/models/cnn/resnet.py:24-31,
vit/deit_models.py:109-188).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

FIXTURE_ROOT = Path(__file__).resolve().parents[1] / "tests" / "fixtures"

# (model name, img_size, in_channels)
GOLDEN_MODELS = [
    ("resnet18", 224, 1),
    ("resnet50", 224, 1),
    ("densenet121", 224, 1),
    ("efficientnet_b0", 224, 1),
    ("inception_v3", 224, 1),
    ("vit_tiny", 224, 1),
    ("deit_tiny", 224, 1),
    ("swin_tiny", 224, 1),
]

# torchvision / timm constructors for the real-weight fixtures
TORCH_SOURCES = {
    "resnet50": ("torchvision", "resnet50"),
    "densenet121": ("torchvision", "densenet121"),
    "efficientnet_b0": ("timm", "efficientnet_b0"),
    "inception_v3": ("torchvision", "inception_v3"),
    "vit_tiny": ("timm", "vit_tiny_patch16_224"),
    "deit_tiny": ("timm", "deit_tiny_distilled_patch16_224"),
    "swin_tiny": ("timm", "swin_tiny_patch4_window7_224"),
}


def fixed_input(img: int, channels: int, batch: int = 2) -> np.ndarray:
    """The shared fixed input: same bytes at record and test time."""
    rs = np.random.RandomState(12345)
    return (rs.rand(batch, img, img, channels).astype(np.float32) * 2 - 1)


def perturb_params(variables):
    """Deterministic sinusoid added to EVERY param leaf so zero-initialised
    heads (efficientnet/inception) still expose backbone changes in the
    logits. Must match tests/unit/test_golden_parity.py exactly."""
    import jax
    import jax.numpy as jnp

    def bump(p):
        if p.dtype not in (jnp.float32, jnp.bfloat16, jnp.float16):
            return p
        wave = jnp.sin(jnp.arange(p.size, dtype=jnp.float32) * 0.7)
        return p + 0.01 * wave.reshape(p.shape).astype(p.dtype)

    params = jax.tree.map(bump, variables["params"])
    return {**variables, "params": params}


def record_golden() -> None:
    import jax

    from thyroid_tpu.models.base import create_and_init

    out_dir = FIXTURE_ROOT / "golden"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name, img, ch in GOLDEN_MODELS:
        mcfg = {"name": name, "img_size": img, "in_channels": ch,
                "num_classes": 2}
        model, variables = create_and_init(mcfg, jax.random.PRNGKey(0))
        variables = perturb_params(variables)
        x = fixed_input(img, ch)
        out = model.apply(variables, x, train=False)
        if isinstance(out, tuple):
            out = out[0]
        logits = np.asarray(out, dtype=np.float32)
        np.savez(out_dir / f"{name}.npz", logits=logits,
                 img_size=img, in_channels=ch)
        print(f"golden {name}: logits {logits.ravel().round(4).tolist()}")


def record_torch(families: list[str]) -> None:
    import torch

    out_dir = FIXTURE_ROOT / "torch_parity"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in families:
        src, ctor = TORCH_SOURCES[name]
        try:
            if src == "torchvision":
                import torchvision.models as tvm

                tmodel = getattr(tvm, ctor)(weights="DEFAULT")
            else:
                import timm

                tmodel = timm.create_model(ctor, pretrained=True)
        except Exception as e:  # no lib / no egress
            print(f"skip {name}: {type(e).__name__}: {e}")
            continue
        tmodel.eval()
        x = fixed_input(224, 3)
        with torch.no_grad():
            want = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)))
        if isinstance(want, tuple):
            want = want[0]
        torch.save(tmodel.state_dict(), out_dir / f"{name}_state.pt")
        np.savez(out_dir / f"{name}.npz",
                 torch_logits=want.numpy().astype(np.float32))
        print(f"recorded real-weight fixture for {name}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--golden", action="store_true")
    p.add_argument("--torch-weights", action="store_true")
    p.add_argument("--families", nargs="*", default=list(TORCH_SOURCES))
    args = p.parse_args()
    if args.golden:
        record_golden()
    if args.torch_weights:
        record_torch(args.families)
    if not (args.golden or args.torch_weights):
        p.error("pass --golden and/or --torch-weights")


if __name__ == "__main__":
    main()
