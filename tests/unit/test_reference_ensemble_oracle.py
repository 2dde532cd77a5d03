"""Ensemble-combination parity against the reference's OWN runnable code.

The reference's ThyroidCNNEnsemble (src/models/ensemble/cnn_ensemble.py:19)
wraps timm members we cannot instantiate here, but its COMBINATION math —
temperature scaling, accuracy-weighted / simple averaging, weighted voting,
and the inter-model-std uncertainty of `predict` (:246-247) — runs fine
once `_load_models` is monkeypatched to install deterministic stub members.
Each test feeds the reference class and our CNNEnsemble the SAME member
logits (identical linear stub models on both sides) and asserts the
combined outputs agree.

Reference anchors: src/models/ensemble/cnn_ensemble.py:44-57 (weights),
:125-141 (temperature + member softmax), :147-176 (the three methods),
:234-261 (predict / uncertainty).
"""
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF_ENSEMBLE = Path("/root/reference/src/models/ensemble/cnn_ensemble.py")

pytestmark = pytest.mark.skipif(
    not REF_ENSEMBLE.exists(), reason="reference checkout not available")

torch = pytest.importorskip("torch")

from tests.unit.test_reference_model_oracle import _install_stubs, _load  # noqa: E402

MEMBERS = ("resnet50", "efficientnet_b0", "densenet121")

# per-member (W: (1, 2), b: (2,)) for logits = mean(x) @ W + b — distinct
# enough that members disagree on some samples (exercises voting/uncertainty)
_STUB_PARAMS = {
    "resnet50": (np.array([[2.0, -1.0]], np.float32),
                 np.array([0.1, -0.2], np.float32)),
    "efficientnet_b0": (np.array([[-1.5, 2.5]], np.float32),
                        np.array([0.3, 0.0], np.float32)),
    "densenet121": (np.array([[0.5, 0.4]], np.float32),
                    np.array([-0.6, 0.7], np.float32)),
}


class _TorchStubMember(torch.nn.Module):
    """logits = spatial-mean(x) @ W + b (x: (B, 1, H, W))."""

    def __init__(self, name: str):
        super().__init__()
        w, b = _STUB_PARAMS[name]
        self.w = torch.from_numpy(w)
        self.b = torch.from_numpy(b)

    def forward(self, x):
        pooled = x.mean(dim=(2, 3))           # (B, 1)
        return pooled @ self.w + self.b


class _JaxStubMember:
    """Same math with the CNNEnsemble member protocol (apply(variables, x))."""

    def __init__(self, name: str):
        self.w, self.b = _STUB_PARAMS[name]

    def apply(self, variables, x, train=False):
        import jax.numpy as jnp
        pooled = x.mean(axis=(1, 2))          # x: (B, H, W, 1) → (B, 1)
        return pooled @ jnp.asarray(self.w) + jnp.asarray(self.b)


@pytest.fixture(scope="module")
def ref_cls():
    _install_stubs()
    pl = sys.modules["pytorch_lightning"]
    if not hasattr(pl.LightningModule, "freeze"):       # __init__ calls it
        def freeze(self):
            for p in self.parameters():
                p.requires_grad = False
            self.eval()
        pl.LightningModule.freeze = freeze
    for pkg in ("src.models.ensemble", "src.training"):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = []
            sys.modules[pkg] = m
    mod = _load("src.models.ensemble.cnn_ensemble", REF_ENSEMBLE)
    return mod.ThyroidCNNEnsemble


def _ref_ensemble(ref_cls, method: str, temperature: float = 1.0):
    def _stub_load(self, checkpoint_paths, device_type):
        for name in checkpoint_paths:
            self.models[name] = _TorchStubMember(name)
    orig = ref_cls._load_models
    ref_cls._load_models = _stub_load
    try:
        return ref_cls(checkpoint_paths={n: f"/dev/null/{n}" for n in MEMBERS},
                       num_classes=2, ensemble_method=method,
                       temperature=temperature, device_type="cpu")
    finally:
        ref_cls._load_models = orig


def _ours(method: str, temperature: float = 1.0):
    from thyroid_tpu.models.ensemble import CNNEnsemble
    return CNNEnsemble(
        member_names=list(MEMBERS),
        modules=[_JaxStubMember(n) for n in MEMBERS],
        variables=[{} for _ in MEMBERS],
        method=method,
        temperature=temperature,
    )


def _batch(n: int = 8, img: int = 16) -> np.ndarray:
    rs = np.random.RandomState(20260819)
    return rs.rand(n, img, img, 1).astype(np.float32)


def _ref_forward(ens, x_nhwc: np.ndarray):
    with torch.no_grad():
        out = ens(torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2))))
    return {k: v.numpy() for k, v in out.items()
            if isinstance(v, torch.Tensor)}


@pytest.mark.unit
@pytest.mark.parametrize("temperature", [1.0, 2.5])
def test_weighted_average_oracle(ref_cls, temperature):
    """Default accuracy-proportional weights + temperature scaling: combined
    probabilities match the reference bit-for-bit-ish (f32 reassociation)."""
    import jax.numpy as jnp
    x = _batch()
    ref = _ref_ensemble(ref_cls, "weighted_avg", temperature)
    want = _ref_forward(ref, x)
    ours = _ours("weighted_average", temperature)
    got = np.asarray(ours(jnp.asarray(x)))
    np.testing.assert_allclose(got, want["probs"], atol=1e-6, rtol=1e-6)
    # weights themselves agree (reference normalises model_info accuracies)
    np.testing.assert_allclose(np.asarray(ours.weights()),
                               np.asarray(ref.weights), atol=1e-6)


@pytest.mark.unit
def test_simple_average_oracle(ref_cls):
    import jax.numpy as jnp
    x = _batch()
    want = _ref_forward(_ref_ensemble(ref_cls, "avg"), x)
    got = np.asarray(_ours("simple_average")(jnp.asarray(x)))
    np.testing.assert_allclose(got, want["probs"], atol=1e-6, rtol=1e-6)


@pytest.mark.unit
def test_weighted_voting_oracle(ref_cls):
    """Reference emits one-hot(argmax of weighted votes) (:160-175); ours
    emits the weighted vote MASS (documented deviation — same argmax, probs
    that sum to 1). Assert the relation explicitly on a batch where the
    members disagree."""
    import jax.numpy as jnp
    x = _batch(n=16)
    want = _ref_forward(_ref_ensemble(ref_cls, "voting"), x)
    got = np.asarray(_ours("weighted_voting")(jnp.asarray(x)))
    member_preds = want["all_probs"].argmax(axis=2)     # (M, B)
    assert len(np.unique(member_preds, axis=0)) > 1, "stub members must disagree"
    np.testing.assert_array_equal(got.argmax(-1), want["probs"].argmax(-1))
    onehot = np.eye(2, dtype=np.float32)[got.argmax(-1)]
    np.testing.assert_allclose(onehot, want["probs"], atol=0)
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-6)


@pytest.mark.unit
def test_uncertainty_oracle(ref_cls):
    """predict()'s uncertainty = unbiased std over members, averaged over
    classes (:246-247) — pins our ddof=1 choice to torch's default."""
    import jax.numpy as jnp
    x = _batch()
    ref = _ref_ensemble(ref_cls, "weighted_avg")
    with torch.no_grad():
        want = ref.predict(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    mean, unc = _ours("weighted_average").predict_with_uncertainty(
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(unc).mean(axis=-1),
                               want["uncertainty"].numpy(),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mean),
                               want["probabilities"].numpy(),
                               atol=1e-6, rtol=1e-6)
