"""HBM-resident batch pipeline — the TPU-native DataLoader replacement.

The reference feeds training through torch DataLoader worker processes doing
per-image CPU cv2 work (reference: src/data/dataset.py:595-661,
datamodule.py:107-171 — identified in SURVEY §3.1 as the hot-loop
bottleneck). Here the full split is decoded once, shipped to device, and the
entire preprocess chain (uint16 coercion → quality preprocessing → resize →
adaptive normalisation) runs as ONE jitted XLA program; per-step work is an
on-device gather + stateless augmentation keyed by the epoch PRNG.

Batch iteration contract:
- train: shuffled permutation per epoch, last partial batch wrapped around
  (every array keeps a static shape for jit)
- eval: sequential, last batch padded with repeats and a 0/1 weight mask so
  metrics are exact
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.augment import train_augment, vit_augment
from ..ops.image import adaptive_normalize, resize_bilinear, standardize, to_uint16_scale
from ..ops.quality import QualityParams, quality_preprocess
from .dataset import CARSThyroidDataset

# ImageNet statistics for the pretrained-backbone branch (gray→RGB repeat +
# ImageNet normalisation — reference: src/data/vit_transforms.py:381-392).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@partial(jax.jit, static_argnames=("img_size", "quality", "params", "chunk"))
def prepare_images(
    raw: jnp.ndarray,
    img_size: int,
    quality: bool = False,
    params: QualityParams = QualityParams(),
    chunk: int = 32,
) -> jnp.ndarray:
    """One-time fused preprocess: uint16-scale → [quality pipeline] → resize →
    per-image percentile normalisation → (N, S, S, 1) float32 in [0,1].

    With the quality pipeline ON, work is processed in fixed-size chunks
    (lax.map) so the spatial-filter and CLAHE intermediates stay bounded
    regardless of split size — a whole 450-image split at 512² would
    otherwise materialise multi-GB temporaries. With quality OFF the only
    intermediate is the resize's separable first pass (~0.5 MB/image), so
    the batch runs unchunked: the lax.map serialised the percentile
    bisection into chunk-count× more tiny latency-bound reduce passes —
    MEASURED on v5e at B=256: resize+normalize 4.42 ms/iter chunked vs
    3.87 ms unchunked."""

    def one_chunk(x):
        x = to_uint16_scale(x)
        if quality:
            x = quality_preprocess(x, params)
        x = resize_bilinear(x, img_size)
        return adaptive_normalize(x, method="percentile", percentiles=(1.0, 99.0))

    n = raw.shape[0]
    if not quality:
        chunk = max(chunk, 512)
    if n <= chunk:
        return one_chunk(raw)
    pad = (-n) % chunk
    padded = jnp.pad(raw, ((0, pad), (0, 0), (0, 0), (0, 0)), mode="edge")
    chunks = padded.reshape(-1, chunk, *raw.shape[1:])
    out = jax.lax.map(one_chunk, chunks)
    return out.reshape(-1, img_size, img_size, raw.shape[-1])[:n]


@dataclass
class Batch:
    image: jnp.ndarray    # (B, S, S, C) float32, standardized
    label: jnp.ndarray    # (B,) int32
    weight: jnp.ndarray   # (B,) float32 — 0 for padding rows


class DevicePipeline:
    """Device-resident pipeline over one split."""

    def __init__(
        self,
        images_u16: np.ndarray,
        labels: np.ndarray,
        batch_size: int = 32,
        img_size: int = 224,
        mean=(0.5,),
        std=(0.5,),
        quality_preprocessing: bool = False,
        augmentation_level: str = "none",
        augment_mode: str = "standard",  # standard | vit
        train: bool = False,
        sharding: Optional[jax.sharding.Sharding] = None,
        out_channels: int = 1,
        vit_aug_params: Optional[dict] = None,
    ):
        self.batch_size = int(batch_size)
        self.img_size = int(img_size)
        self.mean = tuple(float(m) for m in np.atleast_1d(mean))
        self.std = tuple(float(s) for s in np.atleast_1d(std))
        self.train = train
        self.augmentation_level = augmentation_level
        self.augment_mode = augment_mode
        self.out_channels = int(out_channels)
        self.vit_aug_params = dict(vit_aug_params or {})
        self.n = len(labels)
        self.labels = jnp.asarray(labels, dtype=jnp.int32)
        self.sharding = sharding

        raw = jnp.asarray(images_u16.astype(np.float32))
        self.cache = prepare_images(
            raw, self.img_size, quality=bool(quality_preprocessing)
        )
        # free the raw copy; keep only the prepared cache resident
        del raw

        self._batch_fn = jax.jit(self._make_batch, static_argnames=("augment",))

    # -- per-step batch materialisation -----------------------------------
    def _make_batch(self, idx: jnp.ndarray, key: jax.Array, augment: bool,
                    cache: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Materialise one batch from the HBM-resident cache. `cache`
        overrides self.cache so the stacked k-fold trainer can vmap this
        over a fold-stacked cache while reusing the exact same augmentation
        and normalisation program (training/stacked.py)."""
        x = jnp.take(self.cache if cache is None else cache, idx, axis=0)
        if augment and self.augmentation_level != "none":
            if self.augment_mode == "vit":
                x = vit_augment(x, key, **self.vit_aug_params)
            else:
                x = train_augment(x, key, level=self.augmentation_level)
        if self.out_channels == 3 and x.shape[-1] == 1:
            # pretrained-backbone branch: grayscale → 3-channel repeat
            # (reference: vit_transforms.py:381-384 Grayscale(num_output_channels=3))
            x = jnp.repeat(x, 3, axis=-1)
        return standardize(x, self.mean, self.std)

    def steps_per_epoch(self) -> int:
        return max(1, -(-self.n // self.batch_size))

    def epoch(self, key: jax.Array) -> Iterator[Batch]:
        """Yield batches for one epoch."""
        perm_key, aug_key = jax.random.split(key)
        if self.train:
            order = np.asarray(jax.random.permutation(perm_key, self.n))
        else:
            order = np.arange(self.n)
        bs = self.batch_size
        n_steps = self.steps_per_epoch()
        for step in range(n_steps):
            sel = order[step * bs:(step + 1) * bs]
            weight = np.ones(bs, dtype=np.float32)
            if len(sel) < bs:
                pad = bs - len(sel)
                if self.train:
                    # cycle the epoch order — np.resize repeats it, so this
                    # also covers pad > n (tiny split with a large batch)
                    sel = np.concatenate([sel, np.resize(order, pad)])
                else:
                    weight[len(sel):] = 0.0
                    sel = np.concatenate([sel, np.full(pad, sel[-1] if len(sel) else 0)])
            idx = jnp.asarray(sel, dtype=jnp.int32)
            img = self._batch_fn(idx, jax.random.fold_in(aug_key, step),
                                 augment=self.train)
            lbl = jnp.take(self.labels, idx, axis=0)
            w = jnp.asarray(weight)
            if self.sharding is not None:
                img = jax.device_put(img, self.sharding)
                lbl = jax.device_put(lbl, self.sharding)
                w = jax.device_put(w, self.sharding)
            yield Batch(image=img, label=lbl, weight=w)


def _cfg_get(cfg: Any, key: str, default: Any = None) -> Any:
    """Canonical config lookup (models.registry.cfg_get): mapping keys are
    checked before attributes (dodging dict method-name collisions) and an
    explicit None value falls back to the default — a hand-rolled variant
    here used to return None for `mean: null`, crashing float() downstream."""
    from ..models.registry import cfg_get

    return cfg_get(cfg, key, default)


def create_data_loaders(
    dataset_config: Any,
    splits: tuple[str, ...] = ("train", "val", "test"),
    augment_mode: str = "standard",
    sharding: Optional[jax.sharding.Sharding] = None,
    model_config: Any = None,
) -> dict[str, DevicePipeline]:
    """Build DevicePipelines per split — API parity with the reference's
    create_data_loaders (reference: src/data/dataset.py:595-661).

    When the model wants 3 input channels (pretrained ImageNet backbones),
    grayscale images are repeated to RGB and normalised with ImageNet
    statistics unless the dataset config pins 3-channel mean/std explicitly
    (reference: src/data/vit_transforms.py:381-392)."""
    out: dict[str, DevicePipeline] = {}
    level = _cfg_get(dataset_config, "augmentation_level", "medium")
    if not _cfg_get(dataset_config, "apply_augmentations", True):
        level = "none"
    out_channels = int(_cfg_get(model_config, "in_channels", 1) or 1) \
        if model_config is not None else 1
    mean = tuple(np.atleast_1d(_cfg_get(dataset_config, "mean", (0.5,))))
    std = tuple(np.atleast_1d(_cfg_get(dataset_config, "std", (0.5,))))
    if out_channels == 3 and len(mean) == 1:
        mean, std = IMAGENET_MEAN, IMAGENET_STD
    # ViT augmentation flags (reference create_vit_transform args:
    # vit_transforms.py:330-346); magnitude scales with the level ladder.
    vit_aug_params = {
        "use_randaugment": bool(_cfg_get(dataset_config, "use_randaugment", True)),
        "use_patch_quality": bool(_cfg_get(dataset_config, "use_patch_quality", True)),
        "randaugment_n": int(_cfg_get(dataset_config, "randaugment_n", 2)),
        "randaugment_m": float(_cfg_get(
            dataset_config, "randaugment_m",
            {"light": 5.0, "medium": 9.0, "heavy": 14.0}.get(level, 9.0))),
    }
    for split in splits:
        ds = CARSThyroidDataset(dataset_config, split=split)
        images = ds.load_images()
        out[split] = DevicePipeline(
            images,
            ds.labels,
            batch_size=_cfg_get(dataset_config, "batch_size", 32),
            img_size=_cfg_get(dataset_config, "img_size", 224),
            mean=mean,
            std=std,
            quality_preprocessing=_cfg_get(dataset_config, "quality_preprocessing", False),
            augmentation_level=level if split == "train" else "none",
            augment_mode=augment_mode,
            train=(split == "train"),
            sharding=sharding,
            out_channels=out_channels,
            vit_aug_params=vit_aug_params,
        )
    return out
