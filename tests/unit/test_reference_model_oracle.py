"""Model-forward parity against the reference's OWN runnable torch code.

Counterpart to test_reference_oracle.py (quality pipeline): the reference's
from-scratch ViT/DeiT/Swin stack (src/models/vit/{vision_transformer_base,
vit_models,deit_models,swin_transformer}.py) runs here on CPU once its three
unavailable dependencies are stubbed (pytorch_lightning / torchmetrics —
only touched by the Lightning training methods, not forward; timm — only
DropPath/to_2tuple/trunc_normal_ + the pretrained factory, re-implemented
below exactly). Each test instantiates the reference model, perturbs every
parameter deterministically (so init symmetries like LN ones/zeros cannot
hide a mapping bug), imports the state_dict through
models/import_torch.import_for_model, and asserts our flax forward matches
the reference's torch forward in eval mode.

This is executable evidence for the ±0.5% parity goal (SURVEY §7) at the
model-forward level: reference anchors
- ViT:  src/models/vit/vit_models.py:109-118 (ViTTiny),
        vision_transformer_base.py:440-486 (forward)
- DeiT: src/models/vit/deit_models.py:190-238 ([cls,dist,patch] order,
        eval-time head averaging)
- Swin: src/models/vit/swin_transformer.py:607-666 (forward_features),
        :168-169 (ACTIVE contrast scaling), :779-805 (create_swin_tiny)
"""
import importlib.util
import sys
import types
from pathlib import Path

import jax
import numpy as np
import pytest

REF_VIT = Path("/root/reference/src/models/vit")

pytestmark = pytest.mark.skipif(
    not REF_VIT.exists(), reason="reference checkout not available")

torch = pytest.importorskip("torch")
nn_torch = torch.nn


def _install_stubs():
    """Stub the reference stack's unavailable imports (only when absent)."""
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")

        class LightningModule(nn_torch.Module):
            def save_hyperparameters(self, *a, **k):
                import inspect
                frame = inspect.currentframe().f_back
                args = {kk: vv for kk, vv in frame.f_locals.items()
                        if kk not in ("self", "__class__")
                        and not kk.startswith("_")}
                self.hparams = types.SimpleNamespace(**args)

            def log(self, *a, **k):
                pass

        pl.LightningModule = LightningModule
        sys.modules["pytorch_lightning"] = pl

    if "torchmetrics" not in sys.modules:
        tm = types.ModuleType("torchmetrics")

        class _Metric(nn_torch.Module):
            def __init__(self, *a, **k):
                super().__init__()

            def forward(self, *a, **k):
                return torch.tensor(0.0)

        for name in ("Accuracy", "AUROC", "F1Score", "Specificity",
                     "Recall", "Precision", "StatScores"):
            setattr(tm, name, type(name, (_Metric,), {}))
        sys.modules["torchmetrics"] = tm

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")
        tvit = types.ModuleType("timm.models.vision_transformer")

        def to_2tuple(x):
            return x if isinstance(x, tuple) else (x, x)

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                tensor.normal_(mean, std).clamp_(a * std, b * std)
            return tensor

        class DropPath(nn_torch.Module):
            def __init__(self, drop_prob=0.0):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):  # eval-mode identity is all tests need
                return x

        layers.DropPath = DropPath
        layers.to_2tuple = to_2tuple
        layers.trunc_normal_ = trunc_normal_
        tvit.VisionTransformer = type("VisionTransformer", (), {})

        def _no_timm(*a, **k):
            raise RuntimeError("timm stub: pretrained loading unavailable")

        timm.create_model = _no_timm
        timm.models = timm_models
        timm_models.layers = layers
        timm_models.vision_transformer = tvit
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.vision_transformer"] = tvit
        sys.modules["timm.models.layers"] = layers

    for pkg in ("src", "src.models", "src.models.vit"):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = []
            sys.modules[pkg] = m


def _load(dotted: str, path: Path):
    if dotted in sys.modules:
        return sys.modules[dotted]
    spec = importlib.util.spec_from_file_location(dotted, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[dotted] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    _install_stubs()
    base = _load("src.models.vit.vision_transformer_base",
                 REF_VIT / "vision_transformer_base.py")
    vit = _load("src.models.vit.vit_models", REF_VIT / "vit_models.py")
    deit = _load("src.models.vit.deit_models", REF_VIT / "deit_models.py")
    swin = _load("src.models.vit.swin_transformer",
                 REF_VIT / "swin_transformer.py")
    return types.SimpleNamespace(base=base, vit=vit, deit=deit, swin=swin)


def _seed_torch():
    """torch's GLOBAL generator seeds from system entropy at first use, so
    reference-model inits (trunc_normal_) differ per process unless pinned —
    observed as an order-dependent ~8e-4 swin logit drift vs the 5e-4 atol."""
    torch.manual_seed(20260819)


def _perturb_torch(model) -> None:
    """Deterministic bumps on every parameter — breaks ones/zeros inits
    (LN scales, biases, contrast_scale) so a dropped or misrouted tensor in
    the importer shows up as a logit mismatch."""
    with torch.no_grad():
        for i, p in enumerate(model.parameters()):
            wave = torch.cos(
                torch.arange(p.numel(), dtype=torch.float32) * 0.7 + i)
            p.add_(0.02 * wave.reshape(p.shape))


def _fixed_image(img: int, batch: int = 2) -> np.ndarray:
    rs = np.random.RandomState(20260819)
    return rs.rand(batch, img, img, 1).astype(np.float32)


def _ours(name: str, extra: dict, x_nhwc: np.ndarray, state_dict):
    from thyroid_tpu.models.base import create_and_init
    from thyroid_tpu.models.import_torch import import_for_model, merge_imported

    img = x_nhwc.shape[1]
    mcfg = {"name": name, "img_size": img, "in_channels": 1,
            "num_classes": 2, **extra}
    model, variables = create_and_init(mcfg, jax.random.PRNGKey(0))
    imported = import_for_model(name, state_dict, variables,
                                in_channels=1, num_classes=2)
    merged = merge_imported(variables, imported)
    out = model.apply(merged, x_nhwc, train=False)
    if isinstance(out, tuple):
        out = out[0]
    return np.asarray(out, dtype=np.float32), variables, imported


def _torch_logits(model, x_nhwc: np.ndarray) -> np.ndarray:
    model.eval()
    with torch.no_grad():
        t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
        out = model(t)
    if isinstance(out, tuple):
        out = out[0]
    return out.numpy()


@pytest.mark.unit
def test_vit_tiny_logit_oracle(ref):
    _seed_torch()
    m = ref.vit.ViTTiny(img_size=64, patch_size=16, in_chans=1, num_classes=2)
    _perturb_torch(m)
    x = _fixed_image(64)
    want = _torch_logits(m, x)
    got, _, _ = _ours("vit_tiny", {}, x, m.state_dict())
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


@pytest.mark.unit
def test_deit_tiny_logit_oracle(ref):
    _seed_torch()
    m = ref.deit.DeiTTiny(img_size=64, patch_size=16, in_chans=1,
                          num_classes=2, pretrained=False)
    _perturb_torch(m)
    x = _fixed_image(64)
    want = _torch_logits(m, x)  # eval mode: (cls + dist) / 2, :230-235
    got, _, _ = _ours("deit_tiny", {}, x, m.state_dict())
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


SWIN_CFG = {
    # reference-FAITHFUL runtime config. The reference's create_swin_tiny
    # defaults medical_adaptations=True, but at runtime only contrast
    # scaling and the uncertainty head are ACTIVE (swin_transformer.py:206,
    # 225): quality_gate is gated on quality_scores that are always None
    # (:177) and the quality merge branch is defective/dead (:383-391).
    # OUR medical_adaptations=True additionally activates working quality
    # gate/merge branches (a documented deviation, models/vit/swin.py:8-12),
    # so reference parity uses the explicit flags instead.
    "medical_adaptations": False,
    "contrast_adaptive": True,
    "uncertainty_head": True,
    "use_pallas_attention": False,
}


@pytest.mark.unit
def test_swin_tiny_logit_oracle(ref):
    _seed_torch()
    m = ref.swin.create_swin_tiny(img_size=224, in_chans=1, num_classes=2,
                                  pretrained=False)
    _perturb_torch(m)
    x = _fixed_image(224)
    want = _torch_logits(m, x)
    got, _, _ = _ours("swin_tiny", SWIN_CFG, x, m.state_dict())
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


@pytest.mark.slow
def test_swin_padded_windows_logit_oracle(ref):
    """256² swin_tiny: 64→32→16→8 token grids are NOT multiples of window 7,
    so every stage exercises the pad-to-window path on both sides
    (reference swin_transformer.py:301-321; ours models/vit/swin.py padded
    branch, round-3 addition). swin_medical declares 256² inputs
    (configs/model/vit/swin_medical.yaml), so this is the config that
    actually hits padding in production."""
    _seed_torch()
    m = ref.swin.create_swin_tiny(img_size=256, in_chans=1, num_classes=2,
                                  pretrained=False)
    _perturb_torch(m)
    x = _fixed_image(256)
    want = _torch_logits(m, x)
    got, _, _ = _ours("swin_tiny", SWIN_CFG, x, m.state_dict())
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


@pytest.mark.unit
@pytest.mark.parametrize("kind", ["soft", "hard"])
def test_distillation_loss_oracle(ref, kind):
    """Our distillation_loss vs the reference's own DistillationLoss
    (deit_models.py:417-480) on fixed logits — soft KL·τ² and hard-CE
    branches plus the (1−α)/α blend."""
    from thyroid_tpu.training.losses import distillation_loss

    rs = np.random.RandomState(7)
    cls_l = rs.randn(8, 2).astype(np.float32) * 2
    dist_l = rs.randn(8, 2).astype(np.float32) * 2
    teach = rs.randn(8, 2).astype(np.float32) * 2
    y = rs.randint(0, 2, size=(8,))

    crit = ref.deit.DistillationLoss(distillation_type=kind,
                                     alpha=0.35, tau=3.0)
    want = crit(
        (torch.from_numpy(cls_l), torch.from_numpy(dist_l)),
        torch.from_numpy(y),
        teacher_outputs=torch.from_numpy(teach),
    ).item()

    got, _ = distillation_loss(
        (cls_l, dist_l), teach, y, alpha=0.35, temperature=3.0,
        distillation_type=kind)
    np.testing.assert_allclose(float(got), want, atol=1e-6, rtol=1e-6)


@pytest.mark.unit
def test_swin_reference_import_covers_model_tree(ref):
    """Every param leaf of our swin (contrast + uncertainty on) must be
    filled by the reference-native import — no silent fresh-init leaves."""
    from thyroid_tpu.models.base import create_and_init
    from thyroid_tpu.models.import_torch import import_for_model

    _seed_torch()
    m = ref.swin.create_swin_tiny(img_size=224, in_chans=1, num_classes=2,
                                  pretrained=False)
    mcfg = {"name": "swin_tiny", "img_size": 224, "in_channels": 1,
            "num_classes": 2, **SWIN_CFG}
    _, variables = create_and_init(mcfg, jax.random.PRNGKey(0))
    imported = import_for_model("swin_tiny", m.state_dict(), variables,
                                in_channels=1, num_classes=2)

    def leaves(tree, p=()):
        out = set()
        for k, v in tree.items():
            if hasattr(v, "items"):
                out |= leaves(v, p + (k,))
            else:
                out.add(p + (k,))
        return out

    missing = leaves(variables["params"]) - leaves(imported["params"])
    assert not missing, sorted("/".join(p) for p in missing)
