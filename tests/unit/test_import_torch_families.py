"""Weight-importer forward-equivalence for the round-2 families:
Swin / DenseNet / EfficientNet / Inception-v3 — hand-built torch modules with
timm/torchvision-compatible state_dict naming and ORDER (neither timm nor
torchvision ships in this image, and there is no egress to fetch real
weights; structural mimics are the strongest available oracle).

Also covers the `pretrained_path` wiring through create_and_init
(VERDICT round-1 missing item #2).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from thyroid_tpu.models.base import create_and_init
from thyroid_tpu.models.import_torch import (
    import_cnn_by_order, import_swin, merge_imported,
)


def _equiv(model, merged, tmodel, img, ch, atol, batch=2, seed=0):
    x = np.random.RandomState(seed).rand(batch, img, img, ch).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.tensor(x.transpose(0, 3, 1, 2)))
    if isinstance(want, tuple):
        want = want[0]
    want = want.numpy()
    got = model.apply(merged, jnp.asarray(x), train=False)
    if isinstance(got, tuple):
        got = got[0]
    got = np.asarray(got)
    assert np.abs(got - want).max() < atol, np.abs(got - want).max()


# ---------------------------------------------------------------------------
# Swin (timm naming)
# ---------------------------------------------------------------------------

def _rel_index(ws):
    coords = torch.stack(torch.meshgrid(torch.arange(ws), torch.arange(ws),
                                        indexing="ij"))
    flat = coords.flatten(1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _win_part(x, ws):
    b, h, w, c = x.shape
    x = x.view(b, h // ws, ws, w // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _win_rev(wins, ws, h, w):
    c = wins.shape[-1]
    b = wins.shape[0] // ((h // ws) * (w // ws))
    x = wins.view(b, h // ws, w // ws, ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


class TimmWindowAttention(tnn.Module):
    def __init__(self, dim, ws, heads):
        super().__init__()
        self.ws, self.heads = ws, heads
        self.relative_position_bias_table = tnn.Parameter(
            torch.randn((2 * ws - 1) ** 2, heads) * 0.02)
        self.register_buffer("relative_position_index", _rel_index(ws))
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x, mask=None):
        b_, n, c = x.shape
        h = self.heads
        hd = c // h
        qkv = self.qkv(x).reshape(b_, n, 3, h, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(n, n, h)
        attn = attn + bias.permute(2, 0, 1)[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, h, n, n) + mask[None, :, None]
            attn = attn.view(b_, h, n, n)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.proj(x)


class TimmSwinBlock(tnn.Module):
    def __init__(self, dim, res, heads, ws, shift):
        super().__init__()
        if min(res) <= ws:
            ws, shift = min(res), 0
        self.res, self.ws, self.shift = res, ws, shift
        # reference-style zero-pad to window multiples
        # (src/models/vit/swin_transformer.py:256-262)
        self.pad_b = (-res[0]) % ws
        self.pad_r = (-res[1]) % ws
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = TimmWindowAttention(dim, ws, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, dim * 4)
        self.mlp.fc2 = tnn.Linear(dim * 4, dim)
        if shift > 0:
            h, w = res[0] + self.pad_b, res[1] + self.pad_r
            img_mask = torch.zeros(1, h, w, 1)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                    img_mask[:, hs, wsl, :] = cnt
                    cnt += 1
            mw = _win_part(img_mask, ws).view(-1, ws * ws)
            am = mw[:, None, :] - mw[:, :, None]
            self.register_buffer("attn_mask",
                                 torch.where(am != 0, -100.0, 0.0))
        else:
            self.attn_mask = None

    def forward(self, x):
        h, w = self.res
        b, l, c = x.shape
        shortcut = x
        x = self.norm1(x).view(b, h, w, c)
        if self.pad_b or self.pad_r:
            x = F.pad(x, (0, 0, 0, self.pad_r, 0, self.pad_b))
        hp, wp = h + self.pad_b, w + self.pad_r
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
        wins = _win_part(x, self.ws)
        wins = self.attn(wins, self.attn_mask)
        x = _win_rev(wins, self.ws, hp, wp)
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        if self.pad_b or self.pad_r:
            x = x[:, :h, :w]
        x = shortcut + x.reshape(b, l, c)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))


class TimmPatchMerging(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = tnn.LayerNorm(4 * dim)

    def forward(self, x, res):
        h, w = res
        b, l, c = x.shape
        x = x.view(b, h, w, c)
        x = torch.cat([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                       x[:, 0::2, 1::2], x[:, 1::2, 1::2]], dim=-1)
        x = x.view(b, -1, 4 * c)
        return self.reduction(self.norm(x))


class TimmSwin(tnn.Module):
    """timm-naming Swin: img 32, patch 4, dims 16→32, depths (2,2)."""

    def __init__(self, img=32, patch=4, dim=16, depths=(2, 2), heads=(2, 2),
                 ws=4, classes=2, in_ch=3):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(in_ch, dim, patch, patch)
        self.patch_embed.norm = tnn.LayerNorm(dim)
        res = img // patch
        self.layers = tnn.ModuleList()
        self.resolutions = []
        for i, d in enumerate(depths):
            stage = tnn.Module()
            cur = dim * 2 ** i
            r = res // 2 ** i
            self.resolutions.append((r, r))
            stage.blocks = tnn.ModuleList([
                TimmSwinBlock(cur, (r, r), heads[i], ws,
                              0 if j % 2 == 0 else ws // 2)
                for j in range(d)])
            if i < len(depths) - 1:
                stage.downsample = TimmPatchMerging(cur)
            self.layers.append(stage)
        self.norm = tnn.LayerNorm(dim * 2 ** (len(depths) - 1))
        self.head = tnn.Linear(dim * 2 ** (len(depths) - 1), classes)

    def forward(self, x):
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = self.patch_embed.norm(x)
        for i, stage in enumerate(self.layers):
            for blk in stage.blocks:
                x = blk(x)
            if hasattr(stage, "downsample"):
                x = stage.downsample(x, self.resolutions[i])
        x = self.norm(x)
        return self.head(x.mean(dim=1))


@pytest.mark.integration
class TestSwinImport:
    def test_forward_equivalence(self):
        torch.manual_seed(0)
        tmodel = TimmSwin().eval()
        imported = import_swin(tmodel.state_dict(), in_channels=3,
                               num_classes=2)
        model, variables = create_and_init(
            {"name": "swin_tiny", "img_size": 32, "in_channels": 3,
             "num_classes": 2,
             "params": {"patch_size": 4, "embed_dim": 16,
                        "depths": [2, 2], "num_heads": [2, 2],
                        "window_size": 4, "drop_path_rate": 0.0,
                        "drop_rate": 0.0}},
            jax.random.PRNGKey(0))
        merged = merge_imported(variables, imported)
        _equiv(model, merged, tmodel, 32, 3, atol=2e-3)

    def test_forward_equivalence_padded_windows(self):
        # img 48 / ws 8: stage-1 maps are 12×12 → zero-padded to 16×16
        # inside each block (reference swin_transformer.py:256-262); the
        # flax pad path must match torch semantics exactly.
        torch.manual_seed(1)
        tmodel = TimmSwin(img=48, ws=8).eval()
        assert tmodel.layers[0].blocks[0].pad_b == 4  # pad path exercised
        imported = import_swin(tmodel.state_dict(), in_channels=3,
                               num_classes=2)
        model, variables = create_and_init(
            {"name": "swin_tiny", "img_size": 48, "in_channels": 3,
             "num_classes": 2,
             "params": {"patch_size": 4, "embed_dim": 16,
                        "depths": [2, 2], "num_heads": [2, 2],
                        "window_size": 8, "drop_path_rate": 0.0,
                        "drop_rate": 0.0}},
            jax.random.PRNGKey(0))
        merged = merge_imported(variables, imported)
        _equiv(model, merged, tmodel, 48, 3, atol=2e-3)

    def test_gray_adaptation_and_head_skip(self):
        tmodel = TimmSwin(classes=1000).eval()
        imported = import_swin(tmodel.state_dict(), in_channels=1,
                               num_classes=2)
        assert "head" not in imported["params"]
        model, variables = create_and_init(
            {"name": "swin_tiny", "img_size": 32, "in_channels": 1,
             "num_classes": 2,
             "params": {"patch_size": 4, "embed_dim": 16,
                        "depths": [2, 2], "num_heads": [2, 2],
                        "window_size": 4, "drop_path_rate": 0.0}},
            jax.random.PRNGKey(0))
        merged = merge_imported(variables, imported)
        out = model.apply(merged, jnp.zeros((1, 32, 32, 1)), train=False)
        assert out.shape == (1, 2)


# ---------------------------------------------------------------------------
# DenseNet (torchvision/timm naming — identical layouts)
# ---------------------------------------------------------------------------

class TorchDenseLayer(tnn.Module):
    def __init__(self, cin, growth, bn_size=4):
        super().__init__()
        self.norm1 = tnn.BatchNorm2d(cin)
        self.conv1 = tnn.Conv2d(cin, bn_size * growth, 1, bias=False)
        self.norm2 = tnn.BatchNorm2d(bn_size * growth)
        self.conv2 = tnn.Conv2d(bn_size * growth, growth, 3, padding=1,
                                bias=False)

    def forward(self, x):
        y = self.conv1(torch.relu(self.norm1(x)))
        y = self.conv2(torch.relu(self.norm2(y)))
        return torch.cat([x, y], 1)


class TorchDenseNet(tnn.Module):
    def __init__(self, growth=8, blocks=(2, 2), init_f=16, classes=2, in_ch=3):
        super().__init__()
        f = tnn.Module()
        f.conv0 = tnn.Conv2d(in_ch, init_f, 7, 2, 3, bias=False)
        f.norm0 = tnn.BatchNorm2d(init_f)
        ch = init_f
        for i, n in enumerate(blocks):
            block = tnn.Module()
            for j in range(n):
                setattr(block, f"denselayer{j + 1}",
                        TorchDenseLayer(ch + j * growth, growth))
            setattr(f, f"denseblock{i + 1}", block)
            ch += n * growth
            if i != len(blocks) - 1:
                tr = tnn.Module()
                tr.norm = tnn.BatchNorm2d(ch)
                tr.conv = tnn.Conv2d(ch, ch // 2, 1, bias=False)
                setattr(f, f"transition{i + 1}", tr)
                ch //= 2
        f.norm5 = tnn.BatchNorm2d(ch)
        self.features = f
        self.blocks_cfg = blocks
        self.classifier = tnn.Linear(ch, classes)

    def forward(self, x):
        f = self.features
        x = torch.relu(f.norm0(f.conv0(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        for i in range(len(self.blocks_cfg)):
            block = getattr(f, f"denseblock{i + 1}")
            j = 1
            while hasattr(block, f"denselayer{j}"):
                x = getattr(block, f"denselayer{j}")(x)
                j += 1
            if hasattr(f, f"transition{i + 1}"):
                tr = getattr(f, f"transition{i + 1}")
                x = F.avg_pool2d(tr.conv(torch.relu(tr.norm(x))), 2, 2)
        x = torch.relu(f.norm5(x))
        x = x.mean(dim=(2, 3))
        return self.classifier(x)


@pytest.mark.integration
class TestDenseNetImport:
    def test_forward_equivalence(self):
        torch.manual_seed(1)
        tmodel = TorchDenseNet().eval()
        cfg = {"name": "densenet121", "img_size": 64, "in_channels": 3,
               "num_classes": 2, "params": {"growth_rate": 8,
                                            "block_config": [2, 2],
                                            "num_init_features": 16}}
        model, variables = create_and_init(cfg, jax.random.PRNGKey(0))
        imported = import_cnn_by_order(tmodel.state_dict(), variables,
                                       in_channels=3, num_classes=2)
        merged = merge_imported(variables, imported)
        _equiv(model, merged, tmodel, 64, 3, atol=5e-3)


# ---------------------------------------------------------------------------
# EfficientNet (timm naming/order: conv_stem, bn1, blocks.S.I.*, conv_head,
# bn2, classifier)
# ---------------------------------------------------------------------------

class TimmMBConv(tnn.Module):
    """Faithful timm naming per block type: InvertedResidual (expand≠1:
    conv_pw/bn1/conv_dw/bn2/se/conv_pwl/bn3 — timm registers the expansion
    conv FIRST) vs DepthwiseSeparableConv (expand=1:
    conv_dw/bn1/se/conv_pw/bn2)."""

    def __init__(self, cin, cout, expand, k, s):
        super().__init__()
        exp = cin * expand
        self.has_expand = expand != 1
        se_ch = max(1, int(cin * 0.25))
        if self.has_expand:
            self.conv_pw = tnn.Conv2d(cin, exp, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(exp)
            self.conv_dw = tnn.Conv2d(exp, exp, k, s, k // 2, groups=exp,
                                      bias=False)
            self.bn2 = tnn.BatchNorm2d(exp)
            self.se = tnn.Module()
            self.se.conv_reduce = tnn.Conv2d(exp, se_ch, 1)
            self.se.conv_expand = tnn.Conv2d(se_ch, exp, 1)
            self.conv_pwl = tnn.Conv2d(exp, cout, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(cout)
        else:
            self.conv_dw = tnn.Conv2d(exp, exp, k, s, k // 2, groups=exp,
                                      bias=False)
            self.bn1 = tnn.BatchNorm2d(exp)
            self.se = tnn.Module()
            self.se.conv_reduce = tnn.Conv2d(exp, se_ch, 1)
            self.se.conv_expand = tnn.Conv2d(se_ch, exp, 1)
            self.conv_pw = tnn.Conv2d(exp, cout, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
        self.skip = s == 1 and cin == cout

    def forward(self, x):
        res = x
        h = x

        def se(h):
            s = h.mean((2, 3), keepdim=True)
            s = self.se.conv_expand(F.silu(self.se.conv_reduce(s)))
            return h * torch.sigmoid(s)

        if self.has_expand:
            h = F.silu(self.bn1(self.conv_pw(h)))
            h = F.silu(self.bn2(self.conv_dw(h)))
            h = self.bn3(self.conv_pwl(se(h)))
        else:
            h = F.silu(self.bn1(self.conv_dw(h)))
            h = self.bn2(self.conv_pw(se(h)))
        return h + res if self.skip else h


class TimmEffNet(tnn.Module):
    """timm-order efficientnet_b0 (full plan, width/depth mult 1.0)."""

    PLAN = ((1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
            (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
            (6, 320, 1, 1, 3))

    def __init__(self, classes=2, in_ch=3):
        super().__init__()
        self.conv_stem = tnn.Conv2d(in_ch, 32, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(32)
        blocks = []
        cin = 32
        for expand, ch, repeats, stride, k in self.PLAN:
            stage = []
            for i in range(repeats):
                stage.append(TimmMBConv(cin, ch, expand, k,
                                        stride if i == 0 else 1))
                cin = ch
            blocks.append(tnn.Sequential(*stage))
        self.blocks = tnn.Sequential(*blocks)
        self.conv_head = tnn.Conv2d(cin, 1280, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(1280)
        self.classifier = tnn.Linear(1280, classes)

    def forward(self, x):
        x = F.silu(self.bn1(self.conv_stem(x)))
        x = self.blocks(x)
        x = F.silu(self.bn2(self.conv_head(x)))
        return self.classifier(x.mean((2, 3)))


@pytest.mark.integration
class TestEfficientNetImport:
    def test_forward_equivalence(self):
        torch.manual_seed(2)
        tmodel = TimmEffNet().eval()
        cfg = {"name": "efficientnet_b0", "img_size": 64, "in_channels": 3,
               "num_classes": 2, "drop_path_rate": 0.0}
        model, variables = create_and_init(cfg, jax.random.PRNGKey(0))
        imported = import_cnn_by_order(tmodel.state_dict(), variables,
                                       in_channels=3, num_classes=2)
        merged = merge_imported(variables, imported)
        _equiv(model, merged, tmodel, 64, 3, atol=5e-3)

    def test_head_skip_on_class_mismatch(self):
        tmodel = TimmEffNet(classes=1000).eval()
        cfg = {"name": "efficientnet_b0", "img_size": 64, "in_channels": 1,
               "num_classes": 2}
        model, variables = create_and_init(cfg, jax.random.PRNGKey(0))
        imported = import_cnn_by_order(tmodel.state_dict(), variables,
                                       in_channels=1, num_classes=2)
        merged = merge_imported(variables, imported)
        out = model.apply(merged, jnp.zeros((1, 64, 64, 1)), train=False)
        assert out.shape == (1, 2)


# ---------------------------------------------------------------------------
# Inception v3 (torchvision naming/order incl. mid-stream AuxLogits)
# ---------------------------------------------------------------------------

class TvBasicConv(tnn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class TvInceptionA(tnn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = TvBasicConv(cin, 64, kernel_size=1)
        self.branch5x5_1 = TvBasicConv(cin, 48, kernel_size=1)
        self.branch5x5_2 = TvBasicConv(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TvBasicConv(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TvBasicConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TvBasicConv(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TvBasicConv(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b2 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        b4 = self.branch_pool(F.avg_pool2d(x, 3, 1, 1))
        return torch.cat([b1, b2, b3, b4], 1)


class TvInceptionB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = TvBasicConv(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TvBasicConv(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TvBasicConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TvBasicConv(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b1 = self.branch3x3(x)
        b2 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        b3 = F.max_pool2d(x, 3, 2)
        return torch.cat([b1, b2, b3], 1)


class TvInceptionC(tnn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = TvBasicConv(cin, 192, kernel_size=1)
        self.branch7x7_1 = TvBasicConv(cin, c7, kernel_size=1)
        self.branch7x7_2 = TvBasicConv(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = TvBasicConv(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TvBasicConv(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = TvBasicConv(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TvBasicConv(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TvBasicConv(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TvBasicConv(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = TvBasicConv(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b2 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        b3 = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        b4 = self.branch_pool(F.avg_pool2d(x, 3, 1, 1))
        return torch.cat([b1, b2, b3, b4], 1)


class TvInceptionD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = TvBasicConv(cin, 192, kernel_size=1)
        self.branch3x3_2 = TvBasicConv(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TvBasicConv(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = TvBasicConv(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TvBasicConv(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TvBasicConv(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b1 = self.branch3x3_2(self.branch3x3_1(x))
        b2 = self.branch7x7x3_4(self.branch7x7x3_3(
            self.branch7x7x3_2(self.branch7x7x3_1(x))))
        b3 = F.max_pool2d(x, 3, 2)
        return torch.cat([b1, b2, b3], 1)


class TvInceptionE(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch1x1 = TvBasicConv(cin, 320, kernel_size=1)
        self.branch3x3_1 = TvBasicConv(cin, 384, kernel_size=1)
        self.branch3x3_2a = TvBasicConv(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = TvBasicConv(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TvBasicConv(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = TvBasicConv(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TvBasicConv(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TvBasicConv(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = TvBasicConv(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b2 = self.branch3x3_1(x)
        b2 = torch.cat([self.branch3x3_2a(b2), self.branch3x3_2b(b2)], 1)
        b3 = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        b3 = torch.cat([self.branch3x3dbl_3a(b3), self.branch3x3dbl_3b(b3)], 1)
        b4 = self.branch_pool(F.avg_pool2d(x, 3, 1, 1))
        return torch.cat([b1, b2, b3, b4], 1)


class TvInceptionAux(tnn.Module):
    def __init__(self, cin, classes):
        super().__init__()
        self.conv0 = TvBasicConv(cin, 128, kernel_size=1)
        self.conv1 = TvBasicConv(128, 768, kernel_size=5)
        self.fc = tnn.Linear(768, classes)

    def forward(self, x):
        x = F.avg_pool2d(x, 5, 3)
        x = self.conv1(self.conv0(x))
        return self.fc(x.mean((2, 3)))


class TvInceptionV3(tnn.Module):
    def __init__(self, classes=2, in_ch=3):
        super().__init__()
        self.Conv2d_1a_3x3 = TvBasicConv(in_ch, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TvBasicConv(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TvBasicConv(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TvBasicConv(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TvBasicConv(80, 192, kernel_size=3)
        self.Mixed_5b = TvInceptionA(192, 32)
        self.Mixed_5c = TvInceptionA(256, 64)
        self.Mixed_5d = TvInceptionA(288, 64)
        self.Mixed_6a = TvInceptionB(288)
        self.Mixed_6b = TvInceptionC(768, 128)
        self.Mixed_6c = TvInceptionC(768, 160)
        self.Mixed_6d = TvInceptionC(768, 160)
        self.Mixed_6e = TvInceptionC(768, 192)
        self.AuxLogits = TvInceptionAux(768, classes)
        self.Mixed_7a = TvInceptionD(768)
        self.Mixed_7b = TvInceptionE(1280)
        self.Mixed_7c = TvInceptionE(2048)
        self.fc = tnn.Linear(2048, classes)

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, 2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, 2)
        x = self.Mixed_5b(x)
        x = self.Mixed_5c(x)
        x = self.Mixed_5d(x)
        x = self.Mixed_6a(x)
        x = self.Mixed_6b(x)
        x = self.Mixed_6c(x)
        x = self.Mixed_6d(x)
        x = self.Mixed_6e(x)
        x = self.Mixed_7a(x)
        x = self.Mixed_7b(x)
        x = self.Mixed_7c(x)
        return self.fc(x.mean((2, 3)))


@pytest.mark.integration
@pytest.mark.slow
class TestInceptionImport:
    def test_forward_equivalence(self):
        torch.manual_seed(3)
        tmodel = TvInceptionV3().eval()
        cfg = {"name": "inception_v3", "img_size": 299, "in_channels": 3,
               "num_classes": 2}
        model, variables = create_and_init(cfg, jax.random.PRNGKey(0))
        imported = import_cnn_by_order(tmodel.state_dict(), variables,
                                       in_channels=3, num_classes=2)
        merged = merge_imported(variables, imported)
        _equiv(model, merged, tmodel, 299, 3, atol=1e-2, batch=1, seed=3)


# ---------------------------------------------------------------------------
# pretrained wiring through create_and_init
# ---------------------------------------------------------------------------

@pytest.mark.integration
class TestPretrainedWiring:
    def test_pretrained_path_warm_starts(self, tmp_path):
        torch.manual_seed(4)
        tmodel = TimmSwin().eval()
        ckpt = tmp_path / "swin_tiny.pth"
        torch.save(tmodel.state_dict(), str(ckpt))
        cfg = {"name": "swin_tiny", "img_size": 32, "in_channels": 3,
               "num_classes": 2, "pretrained_path": str(ckpt),
               "params": {"patch_size": 4, "embed_dim": 16,
                          "depths": [2, 2], "num_heads": [2, 2],
                          "window_size": 4, "drop_path_rate": 0.0}}
        model, variables = create_and_init(cfg, jax.random.PRNGKey(0))
        want = tmodel.patch_embed.proj.weight.detach().numpy()
        got = np.asarray(variables["params"]["patch_embed"]["kernel"])
        assert np.allclose(got, want.transpose(2, 3, 1, 0), atol=1e-6)

    def test_pretrained_true_searches_dir(self, tmp_path, monkeypatch):
        torch.manual_seed(5)
        tmodel = TorchDenseNet().eval()
        torch.save(tmodel.state_dict(), str(tmp_path / "densenet121.pth"))
        monkeypatch.setenv("THYROID_PRETRAINED_DIR", str(tmp_path))
        cfg = {"name": "densenet121", "img_size": 64, "in_channels": 3,
               "num_classes": 2, "pretrained": True,
               "params": {"growth_rate": 8, "block_config": [2, 2],
                          "num_init_features": 16}}
        _, variables = create_and_init(cfg, jax.random.PRNGKey(0))
        want = tmodel.features.conv0.weight.detach().numpy()
        got = np.asarray(variables["params"]["conv0"]["kernel"])
        assert np.allclose(got, want.transpose(2, 3, 1, 0), atol=1e-6)

    def test_pretrained_true_missing_file_warns_and_continues(self, monkeypatch):
        monkeypatch.delenv("THYROID_PRETRAINED_DIR", raising=False)
        cfg = {"name": "resnet18", "img_size": 32, "in_channels": 1,
               "num_classes": 2, "pretrained": True}
        _, variables = create_and_init(cfg, jax.random.PRNGKey(0))
        assert "params" in variables  # fresh init, no crash
