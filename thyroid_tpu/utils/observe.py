"""Observability: scalar logging (TensorBoard / JSONL) + profiling.

Replaces the reference's TensorBoardLogger/WandbLogger wiring
(reference: src/experiment/kfold_experiment.py:258-275,
src/training/train_cnn.py:154-162) and fills the profiling gap the reference
left open (SURVEY §5.1 — only a `profiler: null` config slot) with
first-class jax.profiler trace capture and per-step timing.
"""
from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Any, Dict, Iterator, Optional

from .logging import get_logger

logger = get_logger(__name__)


class MetricLogger:
    """Scalar logger: JSONL always; TensorBoard when tensorboardX is
    importable; wandb when available AND configured (never required)."""

    def __init__(self, log_dir: str | Path, use_tensorboard: bool = True,
                 use_wandb: bool = False, wandb_config: Optional[dict] = None):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a")
        self._tb = None
        self._wandb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(str(self.log_dir / "tb"))
            except Exception:  # pragma: no cover
                logger.info("tensorboardX unavailable; JSONL logging only")
        if use_wandb:
            try:  # pragma: no cover - wandb absent in this environment
                import wandb

                self._wandb = wandb.init(dir=str(self.log_dir),
                                         config=wandb_config or {})
            except Exception:
                logger.info("wandb unavailable; skipping")

    def log(self, metrics: Dict[str, Any], step: int) -> None:
        record = {"step": step, "time": time.time(),
                  **{k: v for k, v in metrics.items()
                     if isinstance(v, (int, float))}}
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in record.items():
                if k not in ("step", "time"):
                    self._tb.add_scalar(k, v, step)
        if self._wandb is not None:  # pragma: no cover
            self._wandb.log(record, step=step)

    def log_image(self, tag: str, image, step: int) -> None:
        """Log a figure or (H, W[, C]) array as an image (reference: wandb
        attention-map logging, lightning_modules.py:661-706). Always writes a
        PNG under log_dir/images/; mirrors to TB/wandb when active."""
        import numpy as np

        img_dir = self.log_dir / "images"
        img_dir.mkdir(exist_ok=True)
        path = img_dir / f"{tag.replace('/', '_')}_{step:05d}.png"
        if hasattr(image, "savefig"):                      # matplotlib figure
            image.savefig(path, dpi=110, bbox_inches="tight")
            import matplotlib.pyplot as plt

            plt.close(image)
        else:
            arr = np.asarray(image)
            arr = (arr - arr.min()) / max(float(arr.max() - arr.min()), 1e-9)
            import cv2

            cv2.imwrite(str(path), (arr * 255).astype(np.uint8))
        if self._tb is not None:
            import cv2

            bgr = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
            if bgr is not None:
                rgb = bgr[..., ::-1] if bgr.ndim == 3 else bgr[..., None]
                self._tb.add_image(tag, rgb, step, dataformats="HWC")
        if self._wandb is not None:  # pragma: no cover
            import wandb

            self._wandb.log({tag: wandb.Image(str(path))}, step=step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:  # pragma: no cover
            self._wandb.finish()


@contextlib.contextmanager
def profile_trace(log_dir: str | Path, enabled: bool = True) -> Iterator[None]:
    """jax.profiler trace capture around a code region; view with
    TensorBoard's profile plugin or xprof."""
    if not enabled:
        yield
        return
    import jax

    path = str(Path(log_dir) / "profile")
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", path)


class StepTimer:
    """Rolling per-step wall-clock stats (steps/sec, ms/step)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    def stats(self) -> Dict[str, float]:
        if not self._times:
            return {}
        import numpy as np

        dt = float(np.median(self._times))
        return {"ms_per_step": dt * 1000.0,
                "steps_per_sec": 1.0 / dt if dt > 0 else 0.0}


def enable_nan_debugging(enable: bool = True) -> None:
    """jax_debug_nans — the TPU-native analogue of torch detect_anomaly
    (reference trainer slot: configs/trainer/default.yaml detect_anomaly)."""
    import jax

    jax.config.update("jax_debug_nans", enable)
