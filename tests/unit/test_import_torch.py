"""Weight-importer tests: build real torch modules with
torchvision/timm-compatible naming, export their state_dicts, import into
flax, and assert numerical forward equivalence.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from thyroid_tpu.models.base import create_and_init
from thyroid_tpu.models.import_torch import (
    conv_to_flax, import_resnet, import_vit, interpolate_pos_embed,
    linear_to_flax, merge_imported,
)


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        identity = self.downsample(x) if self.downsample else x
        return torch.relu(out + identity)


class TorchResNet18(tnn.Module):
    """torchvision-naming resnet18 (3-channel input, 1000 classes)."""

    def __init__(self, num_classes=1000):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        widths = [64, 64, 128, 256, 512]
        for s in range(1, 5):
            blocks = tnn.Sequential(
                TorchBasicBlock(widths[s - 1], widths[s], 2 if s > 1 else 1),
                TorchBasicBlock(widths[s], widths[s]))
            setattr(self, f"layer{s}", blocks)
        self.fc = tnn.Linear(512, num_classes)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        for s in range(1, 5):
            x = getattr(self, f"layer{s}")(x)
        x = x.mean(dim=(2, 3))
        return self.fc(x)


@pytest.mark.unit
class TestConverters:
    def test_conv_layout(self):
        w = torch.randn(8, 3, 7, 7)
        out = conv_to_flax(w)
        assert out.shape == (7, 7, 3, 8)
        assert np.allclose(out[0, 0, 0, 0], w[0, 0, 0, 0].item())

    def test_conv_gray_averaging(self):
        w = torch.randn(8, 3, 7, 7)
        out = conv_to_flax(w, in_channels=1)
        assert out.shape == (7, 7, 1, 8)
        assert np.allclose(out[..., 0, :], conv_to_flax(w).mean(axis=2))

    def test_linear_transpose(self):
        w = torch.randn(10, 20)
        assert linear_to_flax(w).shape == (20, 10)

    def test_pos_embed_interpolation(self):
        pe = np.random.RandomState(0).rand(1, 197, 64).astype(np.float32)
        out = interpolate_pos_embed(pe, 26, num_prefix_tokens=1)  # 5x5 grid
        assert out.shape == (1, 26, 64)
        assert np.array_equal(out[:, :1], pe[:, :1])  # CLS preserved


@pytest.mark.integration
class TestResNetImport:
    def test_forward_equivalence(self):
        torch.manual_seed(0)
        tmodel = TorchResNet18().eval()
        sd = tmodel.state_dict()
        imported = import_resnet(sd, in_channels=3, num_classes=1000)
        model, variables = create_and_init(
            {"name": "resnet18", "img_size": 64, "in_channels": 3,
             "num_classes": 1000}, jax.random.PRNGKey(0))
        merged = merge_imported(variables, imported)
        x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            want = tmodel(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(model.apply(merged, jnp.asarray(x), train=False))
        assert np.abs(got - want).max() < 5e-3, np.abs(got - want).max()

    def test_gray_adaptation_and_head_skip(self):
        tmodel = TorchResNet18(num_classes=1000).eval()
        imported = import_resnet(tmodel.state_dict(), in_channels=1,
                                 num_classes=2)  # head shape mismatch → skip
        model, variables = create_and_init(
            {"name": "resnet18", "img_size": 64, "in_channels": 1,
             "num_classes": 2}, jax.random.PRNGKey(0))
        merged = merge_imported(variables, imported)
        out = model.apply(merged, jnp.zeros((1, 64, 64, 1)), train=False)
        assert out.shape == (1, 2)


class TimmBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(dim, dim * 3)
        self.attn.proj = tnn.Linear(dim, dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, dim * 4)
        self.mlp.fc2 = tnn.Linear(dim * 4, dim)
        self.heads = heads

    def forward(self, x):
        b, n, d = x.shape
        h = self.heads
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(b, n, 3, h, d // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = torch.softmax(q @ k.transpose(-2, -1) * (d // h) ** -0.5, dim=-1)
        y = (a @ v).transpose(1, 2).reshape(b, n, d)
        x = x + self.attn.proj(y)
        return x + self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x))))


class TimmViT(tnn.Module):
    """Minimal timm-naming ViT (patch 16, cls token, learnable pos-embed)."""

    def __init__(self, img=64, patch=16, dim=32, depth=2, heads=2, classes=2):
        super().__init__()
        n = (img // patch) ** 2
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, patch, patch)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = tnn.Parameter(torch.randn(1, n + 1, dim) * 0.02)
        self.blocks = tnn.ModuleList([TimmBlock(dim, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(dim)
        self.head = tnn.Linear(dim, classes)

    def forward(self, x):
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.head(self.norm(x)[:, 0])


@pytest.mark.integration
class TestViTImport:
    def test_forward_equivalence(self):
        torch.manual_seed(1)
        tmodel = TimmViT().eval()
        imported = import_vit(tmodel.state_dict(), in_channels=3, num_classes=2)
        model, variables = create_and_init(
            {"name": "vit_tiny", "img_size": 64, "in_channels": 3,
             "num_classes": 2,
             "params": {"embed_dim": 32, "depth": 2, "num_heads": 2,
                        "patch_size": 16, "drop_path_rate": 0.0,
                        "qkv_bias": True}},
            jax.random.PRNGKey(0))
        merged = merge_imported(variables, imported)
        x = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            want = tmodel(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(model.apply(merged, jnp.asarray(x), train=False))
        assert np.abs(got - want).max() < 2e-3, np.abs(got - want).max()
