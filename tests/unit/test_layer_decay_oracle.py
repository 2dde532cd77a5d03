"""Layer-wise LR decay parity against the reference's OWN runnable code.

The reference's ThyroidViTModule._get_parameter_groups_with_decay
(src/training/lightning_modules.py:628-659) builds torch param_groups:
embedding (patch_embed + cls_token + pos_embed) at base_lr*decay²,
block i of L at base_lr*decay^(L−1−i), head at base_lr. This oracle runs
that exact method (unbound, on a duck-typed self — the heavy module deps
are stubbed) over a ViT-shaped torch stub and asserts
training/schedules.layer_decay_mask emits the SAME per-leaf scale for
every parameter the reference optimizes.

Documented deviation, asserted explicitly below: parameters the reference
leaves OUT of param_groups entirely (the final norm, DeiT's dist_token /
head_dist) are silently frozen by torch; we scale them 1.0 (dist_token:
decay² with the other tokens) so they keep training.
"""
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF_LM = Path("/root/reference/src/training/lightning_modules.py")

pytestmark = pytest.mark.skipif(
    not REF_LM.exists(), reason="reference checkout not available")

torch = pytest.importorskip("torch")
nn = torch.nn

from tests.unit.test_reference_model_oracle import _install_stubs, _load  # noqa: E402

DECAY, BASE_LR, DEPTH = 0.75, 1e-3, 6


def _install_training_stubs():
    """The reference training module's imports beyond the model-oracle set."""
    _install_stubs()
    pl = sys.modules["pytorch_lightning"]
    if not hasattr(pl, "Trainer"):       # annotation-only use in the ref
        pl.Trainer = type("Trainer", (), {})
    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")

        class DictConfig(dict):
            pass

        class OmegaConf:
            @staticmethod
            def to_container(x, resolve=True):
                return dict(x) if isinstance(x, dict) else x

        oc.DictConfig = DictConfig
        oc.OmegaConf = OmegaConf
        sys.modules["omegaconf"] = oc
    for name in ("hydra", "wandb"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    if "src.utils" not in sys.modules:
        m = types.ModuleType("src.utils")
        m.__path__ = []
        sys.modules["src.utils"] = m
    if "src.utils.models" not in sys.modules:
        um = types.ModuleType("src.utils.models")
        um.TeacherModelLoader = type("TeacherModelLoader", (), {})
        um.EnsembleTeacher = type("EnsembleTeacher", (), {})
        sys.modules["src.utils.models"] = um
    if "src.utils.training" not in sys.modules:
        ut = types.ModuleType("src.utils.training")
        ut.get_device = lambda *a, **k: "cpu"
        sys.modules["src.utils.training"] = ut
    if "src.models.registry" not in sys.modules:
        reg = types.ModuleType("src.models.registry")

        class ModelRegistry:
            @staticmethod
            def create_model(*a, **k):
                raise RuntimeError("registry stub")

        reg.ModelRegistry = ModelRegistry
        sys.modules["src.models.registry"] = reg
    if "src.training" not in sys.modules:
        m = types.ModuleType("src.training")
        m.__path__ = []
        sys.modules["src.training"] = m
    # deit_models is REAL reference code (DistillationLoss import); it
    # relative-imports vision_transformer_base, so load that first
    ref_vit = Path("/root/reference/src/models/vit")
    _load("src.models.vit.vision_transformer_base",
          ref_vit / "vision_transformer_base.py")
    _load("src.models.vit.vit_models", ref_vit / "vit_models.py")
    _load("src.models.vit.deit_models", ref_vit / "deit_models.py")


class _AttrDict(dict):
    """Minimal DictConfig mimic: attribute access + .get."""

    __getattr__ = dict.__getitem__


class _StubViT(nn.Module):
    """The attribute surface _get_parameter_groups_with_decay probes."""

    def __init__(self, depth: int = DEPTH, dim: int = 8):
        super().__init__()
        self.patch_embed = nn.Linear(4, dim)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, 5, dim))
        self.blocks = nn.ModuleList(
            [nn.Linear(dim, dim) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim)          # reference leaves this OUT
        self.head = nn.Linear(dim, 2)


@pytest.fixture(scope="module")
def ref_groups():
    _install_training_stubs()
    lm = _load("src.training.lightning_modules", REF_LM)
    model = _StubViT()
    duck = types.SimpleNamespace(
        model=model,
        config=_AttrDict(training=_AttrDict(
            layer_decay=_AttrDict(decay_rate=DECAY),
            optimizer_params=_AttrDict(lr=BASE_LR),
        )),
    )
    groups = lm.ThyroidViTModule._get_parameter_groups_with_decay(duck)
    return model, groups


def _ref_lr_by_param(model, groups):
    """param tensor id → group lr, from the reference's own output."""
    by_id = {}
    for g in groups:
        for p in g["params"]:
            by_id[id(p)] = g["lr"]
    return {name: by_id.get(id(p)) for name, p in model.named_parameters()}


_OUR_NAME = {
    # torch stub name prefix → our flax param path (schedules._layer naming)
    "patch_embed": ("patch_embed", "kernel"),
    "cls_token": ("cls_token",),
    "pos_embed": ("pos_embed",),
    "norm": ("norm", "scale"),
    "head": ("head", "kernel"),
}


def _our_scales():
    from thyroid_tpu.training.schedules import layer_decay_mask

    params = {
        "patch_embed": {"kernel": np.zeros((4, 8))},
        "cls_token": np.zeros((1, 1, 8)),
        "pos_embed": np.zeros((1, 5, 8)),
        "norm": {"scale": np.zeros(8)},
        "head": {"kernel": np.zeros((8, 2))},
    }
    for i in range(DEPTH):
        params[f"block_{i}"] = {"kernel": np.zeros((8, 8))}
    return params, layer_decay_mask(params, DECAY, DEPTH)


@pytest.mark.unit
def test_layer_decay_matches_reference_groups(ref_groups):
    model, groups = ref_groups
    ref_lr = _ref_lr_by_param(model, groups)
    _, scales = _our_scales()

    # embedding set: reference lr base*decay² — ours scale decay²
    for tname in ("patch_embed.weight", "cls_token", "pos_embed"):
        assert ref_lr[tname] == pytest.approx(BASE_LR * DECAY ** 2), tname
    assert scales["patch_embed"]["kernel"] == pytest.approx(DECAY ** 2)
    assert scales["cls_token"] == pytest.approx(DECAY ** 2)
    assert scales["pos_embed"] == pytest.approx(DECAY ** 2)

    # blocks: reference lr base*decay^(L−1−i) — ours the same exponent
    for i in range(DEPTH):
        want = BASE_LR * DECAY ** (DEPTH - 1 - i)
        assert ref_lr[f"blocks.{i}.weight"] == pytest.approx(want), i
        assert scales[f"block_{i}"]["kernel"] == pytest.approx(
            want / BASE_LR), i

    # head: base lr — ours scale 1.0
    assert ref_lr["head.weight"] == pytest.approx(BASE_LR)
    assert scales["head"]["kernel"] == pytest.approx(1.0)


@pytest.mark.unit
def test_frozen_norm_deviation_is_explicit(ref_groups):
    """The reference's param_groups OMIT model.norm — torch silently never
    updates it when layer decay is on. We train it at scale 1.0 (deliberate
    fix, docs/DESIGN.md). This test pins both sides of the deviation so a
    future refactor can't drift silently."""
    model, groups = ref_groups
    ref_lr = _ref_lr_by_param(model, groups)
    assert ref_lr["norm.weight"] is None          # frozen in the reference
    _, scales = _our_scales()
    assert scales["norm"]["scale"] == pytest.approx(1.0)   # trained by us
