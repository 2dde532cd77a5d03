"""Model-level golden parity (SURVEY §7 "numeric parity ±0.5%";
round-1 VERDICT item 7).

Two layers of defence, fixtures recorded by scripts/record_parity_fixtures.py:

- self-golden regression: fixed-seed init + fixed input must reproduce the
  committed logits — catches any silent change to a model family's forward
  math (layout swaps, kernel-default flips, init drift).
- real-weight parity: if torch_parity fixtures exist (recorded in an
  environment WITH torchvision/timm + egress — this image ships neither),
  the recorded real state_dict is imported through models/import_torch.py
  and logits must match the recorded torch outputs. Skipped when absent.
"""
from pathlib import Path

import jax
import numpy as np
import pytest

FIXTURES = Path(__file__).resolve().parents[1] / "fixtures"
GOLDEN = sorted((FIXTURES / "golden").glob("*.npz")) \
    if (FIXTURES / "golden").exists() else []
TORCH_PARITY = sorted((FIXTURES / "torch_parity").glob("*.npz")) \
    if (FIXTURES / "torch_parity").exists() else []


def _fixed_input(img: int, ch: int, batch: int = 2) -> np.ndarray:
    rs = np.random.RandomState(12345)
    return (rs.rand(batch, img, img, ch).astype(np.float32) * 2 - 1)


def _perturb_params(variables):
    """Must match scripts/record_parity_fixtures.py perturb_params."""
    import jax.numpy as jnp

    def bump(p):
        if p.dtype not in (jnp.float32, jnp.bfloat16, jnp.float16):
            return p
        wave = jnp.sin(jnp.arange(p.size, dtype=jnp.float32) * 0.7)
        return p + 0.01 * wave.reshape(p.shape).astype(p.dtype)

    params = jax.tree.map(bump, variables["params"])
    return {**variables, "params": params}


@pytest.mark.unit
@pytest.mark.parametrize("fixture", GOLDEN, ids=lambda p: p.stem)
def test_golden_logits_regression(fixture):
    from thyroid_tpu.models.base import create_and_init

    rec = np.load(fixture)
    img, ch = int(rec["img_size"]), int(rec["in_channels"])
    mcfg = {"name": fixture.stem, "img_size": img, "in_channels": ch,
            "num_classes": 2}
    model, variables = create_and_init(mcfg, jax.random.PRNGKey(0))
    variables = _perturb_params(variables)
    out = model.apply(variables, _fixed_input(img, ch), train=False)
    if isinstance(out, tuple):
        out = out[0]
    got = np.asarray(out, dtype=np.float32)
    # tolerance covers XLA version / fusion-order drift, not logic changes
    np.testing.assert_allclose(got, rec["logits"], atol=2e-3, rtol=1e-3)


def test_golden_fixtures_exist():
    """The committed fixture set must cover every major family."""
    names = {p.stem for p in GOLDEN}
    assert {"resnet50", "densenet121", "efficientnet_b0", "inception_v3",
            "vit_tiny", "deit_tiny", "swin_tiny"} <= names, names


@pytest.mark.unit
@pytest.mark.parametrize("fixture", TORCH_PARITY, ids=lambda p: p.stem)
def test_real_weight_parity(fixture):
    """Import REAL pretrained torch weights and match recorded torch logits.

    Runs only when fixtures were recorded (needs torchvision/timm + egress
    at record time; torch-free here — the state_dict .pt is loaded with
    numpy-only torch.load if torch is present, else skipped)."""
    torch = pytest.importorskip("torch")
    from thyroid_tpu.models.base import create_and_init
    from thyroid_tpu.models.import_torch import import_for_model, merge_imported

    name = fixture.stem
    state_path = fixture.with_name(f"{name}_state.pt")
    if not state_path.exists():
        pytest.skip(f"no state_dict for {name}")
    rec = np.load(fixture)
    state = torch.load(state_path, map_location="cpu", weights_only=True)
    num_classes = int(rec["torch_logits"].shape[-1])
    mcfg = {"name": name, "img_size": 224, "in_channels": 3,
            "num_classes": num_classes}
    model, variables = create_and_init(mcfg, jax.random.PRNGKey(0))
    imported = import_for_model(name, state, variables,
                                in_channels=3, num_classes=num_classes)
    merged = merge_imported(variables, imported)
    out = model.apply(merged, _fixed_input(224, 3), train=False)
    if isinstance(out, tuple):
        out = out[0]
    np.testing.assert_allclose(np.asarray(out), rec["torch_logits"],
                               atol=1e-3, rtol=1e-3)
