"""PyTorch/timm → flax weight importer.

Rebuilds the reference's pretrained-warm-start machinery (reference:
src/models/vit/deit_models.py:109-188 — head-skip, pos-embed bicubic
interpolation, RGB→gray first-layer averaging;
src/models/vit/swin_transformer.py:668-775 — gray adaptation + timm factory)
as a standalone converter from torch state_dicts (torchvision / timm naming)
into this framework's flax parameter trees.

Layout conversions:
- conv weight  OIHW → HWIO
- linear weight (out,in) → (in,out)
- BatchNorm  weight/bias/running_mean/running_var → scale/bias + batch_stats
- first conv RGB → grayscale by channel averaging (deit_models.py:157-160)
- learnable pos-embed resized bicubically on token-grid mismatch
  (deit_models.py:166-188)
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def conv_to_flax(w, in_channels: Optional[int] = None) -> np.ndarray:
    """OIHW → HWIO, averaging RGB→gray when in_channels=1 vs torch's 3."""
    w = _np(w).transpose(2, 3, 1, 0)  # HWIO
    if in_channels is not None and w.shape[2] != in_channels:
        if in_channels == 1:
            w = w.mean(axis=2, keepdims=True)
        elif w.shape[2] == 1:
            w = np.repeat(w, in_channels, axis=2) / in_channels
        else:
            raise ValueError(f"cannot adapt conv from {w.shape[2]} to "
                             f"{in_channels} input channels")
    return w


def linear_to_flax(w) -> np.ndarray:
    return _np(w).T


def interpolate_pos_embed(pe: np.ndarray, target_tokens: int,
                          num_prefix_tokens: int = 1) -> np.ndarray:
    """Bicubic grid interpolation of a (1, N+prefix, D) learnable pos-embed
    (reference: deit_models.py:166-188)."""
    import cv2

    prefix = pe[:, :num_prefix_tokens]
    grid = pe[0, num_prefix_tokens:]
    n_old = grid.shape[0]
    side_old = int(np.sqrt(n_old))
    side_new = int(np.sqrt(target_tokens - num_prefix_tokens))
    if side_old * side_old != n_old:
        raise ValueError(f"pos-embed token count {n_old} is not square")
    grid = grid.reshape(side_old, side_old, -1)
    grid = cv2.resize(grid, (side_new, side_new), interpolation=cv2.INTER_CUBIC)
    grid = grid.reshape(1, side_new * side_new, -1)
    return np.concatenate([prefix, grid], axis=1)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


# ---------------------------------------------------------------------------
# ResNet (torchvision naming: conv1, bn1, layerX.Y.convZ/bnZ/downsample)
# ---------------------------------------------------------------------------

def import_resnet(state_dict: Mapping[str, Any], in_channels: int = 1,
                  num_classes: Optional[int] = 2) -> Dict[str, Any]:
    """→ {"params": ..., "batch_stats": ...} matching models.cnn.resnet.ResNet.

    The classifier head is skipped when its shape mismatches num_classes
    (warm start keeps a fresh head, like the reference's strict=False loads).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def bn(src_prefix: str, dst: Tuple[str, ...]) -> None:
        _set(params, dst + ("scale",), _np(state_dict[f"{src_prefix}.weight"]))
        _set(params, dst + ("bias",), _np(state_dict[f"{src_prefix}.bias"]))
        _set(stats, dst + ("mean",), _np(state_dict[f"{src_prefix}.running_mean"]))
        _set(stats, dst + ("var",), _np(state_dict[f"{src_prefix}.running_var"]))

    _set(params, ("conv1", "kernel"),
         conv_to_flax(state_dict["conv1.weight"], in_channels))
    bn("bn1", ("bn1", "BatchNorm_0"))
    # our ResNet names: layer{s}_{i} / ConvBN_{j} {Conv_0, BatchNorm_0}
    layer_sizes: Dict[int, int] = {}
    for key in state_dict:
        m = key.split(".")
        if m[0].startswith("layer") and m[1].isdigit():
            s = int(m[0][5:])
            layer_sizes[s] = max(layer_sizes.get(s, 0), int(m[1]) + 1)
    for s in sorted(layer_sizes):
        for i in range(layer_sizes[s]):
            src = f"layer{s}.{i}"
            dst_block = f"layer{s}_{i}"
            n_convs = len({k.split(".")[2] for k in state_dict
                           if k.startswith(f"{src}.conv")})
            for c in range(1, n_convs + 1):
                dst = (dst_block, f"ConvBN_{c - 1}")
                _set(params, dst + ("Conv_0", "kernel"),
                     conv_to_flax(state_dict[f"{src}.conv{c}.weight"]))
                bn(f"{src}.bn{c}", dst + ("BatchNorm_0",))
            if f"{src}.downsample.0.weight" in state_dict:
                dst = (dst_block, "downsample")
                _set(params, dst + ("Conv_0", "kernel"),
                     conv_to_flax(state_dict[f"{src}.downsample.0.weight"]))
                bn(f"{src}.downsample.1", dst + ("BatchNorm_0",))
    fc_w = _np(state_dict["fc.weight"])
    if num_classes is None or fc_w.shape[0] == num_classes:
        _set(params, ("fc", "kernel"), linear_to_flax(state_dict["fc.weight"]))
        _set(params, ("fc", "bias"), _np(state_dict["fc.bias"]))
    # our bn1 path: the stem BN is named 'bn1' directly (not nested)
    params["bn1"] = params["bn1"]["BatchNorm_0"]
    stats["bn1"] = stats["bn1"]["BatchNorm_0"]
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# ViT / DeiT (timm naming: patch_embed.proj, blocks.N.{norm1,attn.qkv,...})
# ---------------------------------------------------------------------------

def import_vit(state_dict: Mapping[str, Any], in_channels: int = 1,
               num_classes: Optional[int] = 2,
               target_tokens: Optional[int] = None,
               distillation: bool = False) -> Dict[str, Any]:
    """→ {"params": ...} matching models.vit.vit.VisionTransformer /
    models.vit.deit.DeiT."""
    params: Dict[str, Any] = {}
    prefix_tokens = 2 if distillation else 1

    _set(params, ("patch_embed", "proj", "kernel"),
         conv_to_flax(state_dict["patch_embed.proj.weight"], in_channels))
    _set(params, ("patch_embed", "proj", "bias"),
         _np(state_dict["patch_embed.proj.bias"]))
    params["cls_token"] = _np(state_dict["cls_token"])
    if distillation and "dist_token" in state_dict:
        params["dist_token"] = _np(state_dict["dist_token"])
    pe = _np(state_dict["pos_embed"])
    if target_tokens is not None and pe.shape[1] != target_tokens:
        pe = interpolate_pos_embed(pe, target_tokens, prefix_tokens)
    params["pos_embed"] = pe

    depth = 1 + max(int(k.split(".")[1]) for k in state_dict
                    if k.startswith("blocks."))
    for i in range(depth):
        src = f"blocks.{i}"
        dst = f"block_{i}"

        def ln(name_src, name_dst):
            _set(params, (dst, name_dst, "scale"),
                 _np(state_dict[f"{src}.{name_src}.weight"]))
            _set(params, (dst, name_dst, "bias"),
                 _np(state_dict[f"{src}.{name_src}.bias"]))

        ln("norm1", "LayerNorm_0")
        ln("norm2", "LayerNorm_1")
        att = (dst, "Attention_0")
        _set(params, att + ("Dense_0", "kernel"),
             linear_to_flax(state_dict[f"{src}.attn.qkv.weight"]))
        if f"{src}.attn.qkv.bias" in state_dict:
            _set(params, att + ("Dense_0", "bias"),
                 _np(state_dict[f"{src}.attn.qkv.bias"]))
        _set(params, att + ("Dense_1", "kernel"),
             linear_to_flax(state_dict[f"{src}.attn.proj.weight"]))
        _set(params, att + ("Dense_1", "bias"),
             _np(state_dict[f"{src}.attn.proj.bias"]))
        mlp = (dst, "Mlp_0")
        _set(params, mlp + ("Dense_0", "kernel"),
             linear_to_flax(state_dict[f"{src}.mlp.fc1.weight"]))
        _set(params, mlp + ("Dense_0", "bias"),
             _np(state_dict[f"{src}.mlp.fc1.bias"]))
        _set(params, mlp + ("Dense_1", "kernel"),
             linear_to_flax(state_dict[f"{src}.mlp.fc2.weight"]))
        _set(params, mlp + ("Dense_1", "bias"),
             _np(state_dict[f"{src}.mlp.fc2.bias"]))

    _set(params, ("norm", "scale"), _np(state_dict["norm.weight"]))
    _set(params, ("norm", "bias"), _np(state_dict["norm.bias"]))
    head_w = _np(state_dict.get("head.weight", np.zeros((0, 0))))
    if num_classes is None or head_w.shape[:1] == (num_classes,):
        _set(params, ("head", "kernel"), linear_to_flax(state_dict["head.weight"]))
        _set(params, ("head", "bias"), _np(state_dict["head.bias"]))
        if distillation and "head_dist.weight" in state_dict:
            _set(params, ("head_dist", "kernel"),
                 linear_to_flax(state_dict["head_dist.weight"]))
            _set(params, ("head_dist", "bias"),
                 _np(state_dict["head_dist.bias"]))
    return {"params": params}


def merge_imported(variables: Dict[str, Any],
                   imported: Dict[str, Any]) -> Dict[str, Any]:
    """Overlay imported leaves onto freshly-initialised variables (leaves
    missing from the import — e.g. a fresh head, quality-scoring convs — keep
    their init). Shapes must match where both exist."""
    import jax

    def overlay(dst, src):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(out.get(k), (dict,)):
                out[k] = overlay(out[k], v)
            else:
                if k in out and hasattr(out[k], "shape") and \
                        tuple(out[k].shape) != tuple(np.shape(v)):
                    raise ValueError(
                        f"shape mismatch importing '{k}': "
                        f"{np.shape(v)} vs {tuple(out[k].shape)}")
                out[k] = np.asarray(v)
        return out

    merged = dict(variables)
    for coll in imported:
        base = variables.get(coll, {})
        base = base if isinstance(base, dict) else jax.tree.map(lambda x: x, base)
        merged[coll] = overlay(dict(base), imported[coll])
    return merged


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a .pth/.ckpt file; unwraps Lightning 'state_dict' envelopes and
    strips the reference's 'model.model.'/'model.' prefixes (reference:
    scripts/run_ensemble_kfold_evaluation.py:98-103)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    out = {}
    for k, v in sd.items():
        for prefix in ("model.model.", "model."):
            if k.startswith(prefix):
                k = k[len(prefix):]
                break
        out[k] = v
    return out
