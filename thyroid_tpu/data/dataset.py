"""CARS thyroid dataset: host-side corpus indexing + bulk decode.

TPU-native redesign of the reference's per-item torch Dataset
(reference: src/data/dataset.py:47-661). The reference decodes + resizes +
normalises one image per DataLoader-worker __getitem__ call; here the host
decodes the split ONCE into a pinned uint16 array and all per-sample work
(resize, quality preprocessing, normalisation, augmentation) happens batched
on device (see pipeline.py). At 450×512² uint16 the whole corpus is ~236 MB —
it trivially fits in host RAM and HBM.

Parity points:
- decode fallback chain cv2 → PIL → imageio (reference: tifffile→cv2→PIL,
  dataset.py:488-506; tifffile is not in this environment, cv2 reads TIFFs)
- uint8 sources upscaled ×257 to uint16 (reference: dataset.py:525-529)
- split resolution contract (see corpus.resolve_split)
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from ..utils.logging import get_logger
from .corpus import resolve_split, scan_corpus

logger = get_logger(__name__)


def decode_image(path: str | Path) -> np.ndarray:
    """Decode one image to (H, W) uint16 via the fallback chain."""
    import cv2

    img: Optional[np.ndarray] = None
    arr = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    if arr is not None:
        img = arr
    if img is None:
        try:
            from PIL import Image

            img = np.asarray(Image.open(path))
        except Exception:
            img = None
    if img is None:
        try:
            import imageio.v3 as iio

            img = iio.imread(path)
        except Exception as e:
            raise IOError(f"could not decode image {path}") from e

    if img.ndim == 3:  # RGB(A) → grayscale
        import cv2 as _cv2

        img = _cv2.cvtColor(img[..., :3], _cv2.COLOR_BGR2GRAY)
    if img.dtype == np.uint8:
        img = img.astype(np.uint16) * 257  # 255 → 65535
    elif img.dtype != np.uint16:
        img = np.clip(img.astype(np.float64), 0, 65535).astype(np.uint16)
    return img


class CARSThyroidDataset:
    """Indexed view over one split of the corpus.

    config fields used (schema: thyroid_tpu.config.DatasetConfig):
    data_path, split_dir, split_file, fold, split_file_prefix,
    val/test_split_ratio, random_seed, synthetic, synthetic_size.
    """

    def __init__(self, config: Any, split: str = "train", transform=None):
        self.config = config
        self.split = split
        self.transform = transform

        data_path = Path(self._get("data_path"))
        if self._get("synthetic", False):
            from .synthetic import generate_corpus

            n = int(self._get("synthetic_size", 450))
            diff = float(self._get("synthetic_difficulty", 0.0))
            noise = float(self._get("synthetic_label_noise", 0.0))
            if not (data_path / "normal").exists():
                logger.info("generating synthetic corpus (%d images, "
                            "difficulty %.2f, label noise %.2f) at %s",
                            n, diff, noise, data_path)
            # idempotent: stamps params in _meta.json and regenerates only
            # when they changed, so config edits are never silently ignored
            generate_corpus(data_path, n_images=n, difficulty=diff,
                            label_noise=noise)

        self.all_paths, self.all_labels, self.patient_ids = scan_corpus(data_path)
        if len(self.all_paths) == 0:
            raise FileNotFoundError(
                f"no images under {data_path}/(normal|cancerous) — check data_path"
            )

        if split == "all":
            idx = np.arange(len(self.all_paths))
        else:
            splits = resolve_split(
                self.all_labels,
                split_dir=self._get("split_dir", "data/splits"),
                split_file=self._get("split_file", None),
                fold=self._get("fold", None),
                prefix=self._get("split_file_prefix", "split_fold_"),
                val_split_ratio=self._get("val_split_ratio", 0.15),
                test_split_ratio=self._get("test_split_ratio", 0.15) or 0.15,
                random_seed=self._get("random_seed", 42),
            )
            if split not in splits:
                raise KeyError(f"split '{split}' not in split file (has {list(splits)})")
            idx = np.asarray(splits[split], dtype=np.int64)

        self.indices = idx
        self.labels = self.all_labels[idx]
        self.paths: List[Path] = [self.all_paths[i] for i in idx]

    def _get(self, key: str, default: Any = ...) -> Any:
        cfg = self.config
        if hasattr(cfg, key):
            return getattr(cfg, key)
        if isinstance(cfg, dict) and key in cfg:
            return cfg[key]
        if default is ...:
            raise KeyError(key)
        return default

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, i: int) -> tuple[np.ndarray, int]:
        img = decode_image(self.paths[i])[..., None]
        if self.transform is not None:
            img = self.transform(img)
        return img, int(self.labels[i])

    def load_images(self, num_threads: int = 8) -> np.ndarray:
        """Bulk-decode the whole split → (N, H, W, 1) uint16.

        Uses the native C++ threaded decoder (thyroid_tpu/native) when the
        corpus is PNG/PGM with uniform shapes; otherwise a Python thread pool
        over the cv2→PIL→imageio fallback chain."""
        from ..native import decode_batch_native

        native = decode_batch_native(self.paths, num_threads)
        if native is not None:
            return native
        with ThreadPoolExecutor(max_workers=num_threads) as pool:
            imgs = list(pool.map(decode_image, self.paths))
        return np.stack(imgs)[..., None]

    def class_distribution(self) -> Dict[str, int]:
        from .corpus import CLASS_NAMES

        return {CLASS_NAMES[c]: int((self.labels == c).sum()) for c in (0, 1)}
