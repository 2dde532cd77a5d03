"""Name-based timm/torchvision importers for DenseNet / EfficientNet /
Inception (VERDICT r2 item #7).

The order-based aligner (`import_cnn_by_order`) is fragile to any
module-registration-order difference in a real timm checkpoint; these maps
dispatch purely on dotted names. Each test feeds the structural mimic's
state_dict with its KEY ORDER SHUFFLED — which breaks order alignment by
construction — and asserts forward equivalence, plus that `import_for_model`
auto-selects the name map for timm-named checkpoints.
"""
import collections
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from thyroid_tpu.models.base import create_and_init
from thyroid_tpu.models.import_torch import (
    import_densenet, import_efficientnet, import_for_model,
    import_inception_v3, import_inception_v4, merge_imported,
)

from .test_import_torch_families import (  # structural mimics (timm naming)
    TimmEffNet, TorchDenseNet, TvInceptionV3, _equiv,
)


def _shuffled(sd):
    keys = list(sd.keys())
    random.Random(0).shuffle(keys)
    return collections.OrderedDict((k, sd[k]) for k in keys)


@pytest.mark.integration
class TestDenseNetNamed:
    def test_shuffled_key_order(self):
        torch.manual_seed(1)
        tmodel = TorchDenseNet().eval()
        cfg = {"name": "densenet121", "img_size": 64, "in_channels": 3,
               "num_classes": 2, "params": {"growth_rate": 8,
                                            "block_config": [2, 2],
                                            "num_init_features": 16}}
        model, variables = create_and_init(cfg, jax.random.PRNGKey(0))
        sd = dict(tmodel.state_dict())
        # torchvision names the final norm 'norm5' regardless of depth;
        # the 2-block mimic registers it the same way
        imported = import_densenet(_shuffled(sd), in_channels=3,
                                   num_classes=2)
        merged = merge_imported(variables, imported)
        _equiv(model, merged, tmodel, 64, 3, atol=5e-3)

    def test_dispatch_selects_name_map(self):
        torch.manual_seed(1)
        tmodel = TorchDenseNet().eval()
        cfg = {"name": "densenet121", "img_size": 64, "in_channels": 3,
               "num_classes": 2, "params": {"growth_rate": 8,
                                            "block_config": [2, 2],
                                            "num_init_features": 16}}
        _, variables = create_and_init(cfg, jax.random.PRNGKey(0))
        got = import_for_model("densenet121", _shuffled(tmodel.state_dict()),
                               variables, in_channels=3, num_classes=2)
        want = import_densenet(tmodel.state_dict(), 3, 2)
        flat_g = jax.tree_util.tree_leaves(got["params"])
        flat_w = jax.tree_util.tree_leaves(want["params"])
        assert len(flat_g) == len(flat_w)
        for a, b in zip(flat_g, flat_w):
            np.testing.assert_array_equal(a, b)


@pytest.mark.integration
class TestEfficientNetNamed:
    def test_shuffled_key_order(self):
        torch.manual_seed(2)
        tmodel = TimmEffNet().eval()
        cfg = {"name": "efficientnet_b0", "img_size": 64, "in_channels": 3,
               "num_classes": 2, "drop_path_rate": 0.0}
        model, variables = create_and_init(cfg, jax.random.PRNGKey(0))
        imported = import_efficientnet(_shuffled(tmodel.state_dict()),
                                       in_channels=3, num_classes=2)
        merged = merge_imported(variables, imported)
        _equiv(model, merged, tmodel, 64, 3, atol=5e-3)

    def test_head_skip_on_class_mismatch(self):
        tmodel = TimmEffNet(classes=1000).eval()
        cfg = {"name": "efficientnet_b0", "img_size": 64, "in_channels": 1,
               "num_classes": 2}
        model, variables = create_and_init(cfg, jax.random.PRNGKey(0))
        imported = import_efficientnet(tmodel.state_dict(), in_channels=1,
                                       num_classes=2)
        assert "classifier" not in imported["params"]
        merged = merge_imported(variables, imported)
        out = model.apply(merged, jnp.zeros((1, 64, 64, 1)), train=False)
        assert out.shape == (1, 2)


@pytest.mark.integration
@pytest.mark.slow
class TestInceptionV3Named:
    def test_shuffled_key_order(self):
        torch.manual_seed(3)
        tmodel = TvInceptionV3().eval()
        cfg = {"name": "inception_v3", "img_size": 299, "in_channels": 3,
               "num_classes": 2}
        model, variables = create_and_init(cfg, jax.random.PRNGKey(0))
        imported = import_inception_v3(_shuffled(tmodel.state_dict()),
                                       in_channels=3, num_classes=2)
        merged = merge_imported(variables, imported)
        _equiv(model, merged, tmodel, 299, 3, atol=1e-2, batch=1, seed=3)


# ---------------------------------------------------------------------------
# Inception v4 structural mimic (Cadene/timm naming: features.0-21 Sequential,
# BasicConv2d = .conv/.bn, last_linear)
# ---------------------------------------------------------------------------

class C4Conv(tnn.Module):
    def __init__(self, cin, cout, k, s=1, p=0):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, s, p, bias=False)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


def _avgpool3(x):
    return F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)


class C4Mixed3a(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv = C4Conv(64, 96, 3, 2)

    def forward(self, x):
        return torch.cat([F.max_pool2d(x, 3, 2), self.conv(x)], 1)


class C4Mixed4a(tnn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = tnn.Sequential(C4Conv(160, 64, 1), C4Conv(64, 96, 3))
        self.branch1 = tnn.Sequential(
            C4Conv(160, 64, 1), C4Conv(64, 64, (1, 7), 1, (0, 3)),
            C4Conv(64, 64, (7, 1), 1, (3, 0)), C4Conv(64, 96, 3))

    def forward(self, x):
        return torch.cat([self.branch0(x), self.branch1(x)], 1)


class C4Mixed5a(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv = C4Conv(192, 192, 3, 2)

    def forward(self, x):
        return torch.cat([self.conv(x), F.max_pool2d(x, 3, 2)], 1)


class C4InceptionA(tnn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = C4Conv(384, 96, 1)
        self.branch1 = tnn.Sequential(C4Conv(384, 64, 1),
                                      C4Conv(64, 96, 3, 1, 1))
        self.branch2 = tnn.Sequential(C4Conv(384, 64, 1),
                                      C4Conv(64, 96, 3, 1, 1),
                                      C4Conv(96, 96, 3, 1, 1))
        self.branch3 = tnn.Sequential(tnn.Identity(), C4Conv(384, 96, 1))

    def forward(self, x):
        return torch.cat([self.branch0(x), self.branch1(x), self.branch2(x),
                          self.branch3[1](_avgpool3(x))], 1)


class C4ReductionA(tnn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = C4Conv(384, 384, 3, 2)
        self.branch1 = tnn.Sequential(C4Conv(384, 192, 1),
                                      C4Conv(192, 224, 3, 1, 1),
                                      C4Conv(224, 256, 3, 2))

    def forward(self, x):
        return torch.cat([self.branch0(x), self.branch1(x),
                          F.max_pool2d(x, 3, 2)], 1)


class C4InceptionB(tnn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = C4Conv(1024, 384, 1)
        self.branch1 = tnn.Sequential(
            C4Conv(1024, 192, 1), C4Conv(192, 224, (1, 7), 1, (0, 3)),
            C4Conv(224, 256, (7, 1), 1, (3, 0)))
        self.branch2 = tnn.Sequential(
            C4Conv(1024, 192, 1), C4Conv(192, 192, (7, 1), 1, (3, 0)),
            C4Conv(192, 224, (1, 7), 1, (0, 3)),
            C4Conv(224, 224, (7, 1), 1, (3, 0)),
            C4Conv(224, 256, (1, 7), 1, (0, 3)))
        self.branch3 = tnn.Sequential(tnn.Identity(), C4Conv(1024, 128, 1))

    def forward(self, x):
        return torch.cat([self.branch0(x), self.branch1(x), self.branch2(x),
                          self.branch3[1](_avgpool3(x))], 1)


class C4ReductionB(tnn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = tnn.Sequential(C4Conv(1024, 192, 1),
                                      C4Conv(192, 192, 3, 2))
        self.branch1 = tnn.Sequential(
            C4Conv(1024, 256, 1), C4Conv(256, 256, (1, 7), 1, (0, 3)),
            C4Conv(256, 320, (7, 1), 1, (3, 0)), C4Conv(320, 320, 3, 2))

    def forward(self, x):
        return torch.cat([self.branch0(x), self.branch1(x),
                          F.max_pool2d(x, 3, 2)], 1)


class C4InceptionC(tnn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = C4Conv(1536, 256, 1)
        self.branch1_0 = C4Conv(1536, 384, 1)
        self.branch1_1a = C4Conv(384, 256, (1, 3), 1, (0, 1))
        self.branch1_1b = C4Conv(384, 256, (3, 1), 1, (1, 0))
        self.branch2_0 = C4Conv(1536, 384, 1)
        self.branch2_1 = C4Conv(384, 448, (3, 1), 1, (1, 0))
        self.branch2_2 = C4Conv(448, 512, (1, 3), 1, (0, 1))
        self.branch2_3a = C4Conv(512, 256, (1, 3), 1, (0, 1))
        self.branch2_3b = C4Conv(512, 256, (3, 1), 1, (1, 0))
        self.branch3 = tnn.Sequential(tnn.Identity(), C4Conv(1536, 256, 1))

    def forward(self, x):
        b0 = self.branch0(x)
        b1 = self.branch1_0(x)
        b1 = torch.cat([self.branch1_1a(b1), self.branch1_1b(b1)], 1)
        b2 = self.branch2_2(self.branch2_1(self.branch2_0(x)))
        b2 = torch.cat([self.branch2_3a(b2), self.branch2_3b(b2)], 1)
        b3 = self.branch3[1](_avgpool3(x))
        return torch.cat([b0, b1, b2, b3], 1)


class C4InceptionV4(tnn.Module):
    def __init__(self, classes=2, in_ch=3):
        super().__init__()
        self.features = tnn.Sequential(
            C4Conv(in_ch, 32, 3, 2), C4Conv(32, 32, 3), C4Conv(32, 64, 3, 1, 1),
            C4Mixed3a(), C4Mixed4a(), C4Mixed5a(),
            *[C4InceptionA() for _ in range(4)], C4ReductionA(),
            *[C4InceptionB() for _ in range(7)], C4ReductionB(),
            *[C4InceptionC() for _ in range(3)])
        self.last_linear = tnn.Linear(1536, classes)

    def forward(self, x):
        x = self.features(x)
        return self.last_linear(x.mean((2, 3)))


@pytest.mark.integration
@pytest.mark.slow
class TestInceptionV4Named:
    def test_shuffled_key_order(self):
        torch.manual_seed(4)
        tmodel = C4InceptionV4().eval()
        cfg = {"name": "inception_v4", "img_size": 299, "in_channels": 3,
               "num_classes": 2}
        model, variables = create_and_init(cfg, jax.random.PRNGKey(0))
        imported = import_inception_v4(_shuffled(tmodel.state_dict()),
                                       in_channels=3, num_classes=2)
        merged = merge_imported(variables, imported)
        _equiv(model, merged, tmodel, 299, 3, atol=1e-2, batch=1, seed=4)
