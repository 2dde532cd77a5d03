"""TPU-first inference serving.

Design (no reference counterpart — the reference repo stops at analysis
scripts; this is the deployment story for the same models):

- **Static-shape bucketing.** XLA compiles one program per input shape, so
  arbitrary request sizes would retrace constantly. The engine pre-declares
  a ladder of batch buckets (default 1/8/32/128), pads every request up to
  the smallest bucket that fits, and slices the padding off after. Each
  bucket compiles once (lazily, or eagerly via `warmup()`).
- **On-device preprocessing.** Requests carry RAW frames (e.g. 512×512
  uint16-scale CARS microscopy); the same fused preprocess the training
  pipeline uses (`data.pipeline.prepare_images` — resize + percentile
  normalize [+ quality pipeline]) runs on device inside the serving
  program, so the host never touches pixels beyond the initial transfer.
- **Latency-bounded micro-batching.** `BatchAggregator` coalesces single
  requests into bucket-sized batches, dispatching when either the largest
  bucket fills or the oldest request has waited `max_delay_ms` — the
  standard throughput/latency trade for accelerator serving.

Checkpoints restore through training/checkpoint.py (Orbax), reusing the
metadata["model_config"] the k-fold experiments store with every save.
"""
from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import create_and_init
from ..models.registry import ModelRegistry, cfg_get
from ..ops.image import standardize
from ..data.pipeline import prepare_images


DEFAULT_BUCKETS = (1, 8, 32, 128)


class InferenceEngine:
    """Bucketed batch inference over one model; thread-safe predict."""

    def __init__(
        self,
        model_config: Optional[Any] = None,
        variables: Optional[Dict[str, Any]] = None,
        checkpoint: Optional[str] = None,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        quality: bool = False,
        raw_inputs: bool = True,
        mean: Optional[Sequence[float]] = None,
        std: Optional[Sequence[float]] = None,
        quantize: Optional[str] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        mesh_axis: str = "data",
    ):
        if checkpoint is not None:
            from ..training.checkpoint import load_checkpoint

            variables, metadata = load_checkpoint(checkpoint)
            if model_config is None:
                model_config = metadata.get("model_config")
                if model_config is None:
                    raise ValueError(
                        f"checkpoint {checkpoint} has no model_config "
                        "metadata; pass model_config explicitly")
        if model_config is None:
            raise ValueError("need model_config or checkpoint")
        self.model_config = model_config
        if quantize is not None:
            # the int8 interceptor quantizes nn.Dense/nn.Conv calls; the
            # token-2D Pallas kernels consume raw params the interceptor
            # never sees, so force the plain-module path under quantization
            model_config = dict(model_config.to_dict()
                                if hasattr(model_config, "to_dict")
                                else model_config)
            model_config["token_kernels"] = False
        self.module = ModelRegistry.create_model(model_config)
        if variables is None:
            _, variables = create_and_init(model_config, jax.random.PRNGKey(0))
        # Multi-chip serving: with a mesh, every bucket program is jitted
        # with the batch sharded over `mesh_axis` (ICI data parallelism —
        # the same axis layout the training engine uses) and params
        # replicated; buckets are rounded up to multiples of the axis size
        # so every shard is non-empty and identical in shape.
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            n_shard = int(mesh.shape[mesh_axis])
            buckets = sorted({max(-(-int(b) // n_shard) * n_shard, n_shard)
                              for b in buckets})
            self._rep = NamedSharding(mesh, PartitionSpec())
            self._batch_sharding = NamedSharding(mesh,
                                                 PartitionSpec(mesh_axis))
            variables = jax.device_put(variables, self._rep)
            self.variables = variables
        else:
            self.variables = jax.device_put(variables)
        self.img_size = int(cfg_get(model_config, "img_size", 224))
        self.in_channels = int(cfg_get(model_config, "in_channels", 1))
        self.buckets = tuple(sorted(set(int(b) for b in buckets)))
        self.quality = bool(quality)
        self.raw_inputs = bool(raw_inputs)
        # normalization must match training: 3-channel models were trained
        # on the gray→RGB + ImageNet-stats branch (data/pipeline.py:200),
        # 1-channel on (0.5, 0.5); overridable for non-default dataset stats
        if mean is None or std is None:
            if self.in_channels == 3:
                from ..data.pipeline import IMAGENET_MEAN, IMAGENET_STD

                mean, std = IMAGENET_MEAN, IMAGENET_STD
            else:
                mean, std = (0.5,), (0.5,)
        self.mean, self.std = tuple(mean), tuple(std)
        if quantize not in (None, "int8"):
            raise ValueError(f"quantize must be None or 'int8', got {quantize!r}")
        self.quantize = quantize
        self._fns: Dict[int, Callable] = {}
        self._lock = threading.Lock()

    # -- compiled program per bucket ------------------------------------
    def _fn(self, bucket: int) -> Callable:
        fn = self._fns.get(bucket)
        if fn is not None:
            return fn

        def run(variables, x):
            if self.raw_inputs:
                x = prepare_images(x, self.img_size, quality=self.quality)
            if self.in_channels == 3 and x.shape[-1] == 1:
                x = jnp.repeat(x, 3, axis=-1)     # gray→RGB, as in training
            x = standardize(x, self.mean, self.std)
            if self.quantize == "int8":
                # PTQ serving path (serving/quantize.py) — the `with` wraps
                # TRACING, so the interceptor rewrites the traced program
                from .quantize import int8_serving

                with int8_serving():
                    out = self.module.apply(variables, x, train=False)
            else:
                out = self.module.apply(variables, x, train=False)
            logits = out[0] if isinstance(out, tuple) else out
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        if self.mesh is not None:
            fn = jax.jit(run, in_shardings=(self._rep, self._batch_sharding),
                         out_shardings=self._batch_sharding)
        else:
            fn = jax.jit(run)
        self._fns[bucket] = fn
        return fn

    def bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def warmup(self) -> None:
        """Compile every bucket program up front (serving-ready)."""
        side = 512 if self.raw_inputs else self.img_size
        for b in self.buckets:
            x = jnp.zeros((b, side, side, 1), jnp.float32)
            jax.block_until_ready(self._fn(b)(self.variables, x))

    def predict(self, images: np.ndarray) -> np.ndarray:
        """images (N, S, S, 1) raw frames (or preprocessed if
        raw_inputs=False) → (N, num_classes) probabilities. N may exceed
        the largest bucket; it is chunked."""
        images = np.asarray(images, np.float32)
        if images.ndim == 3:
            images = images[..., None]
        n = images.shape[0]
        top = self.buckets[-1]
        outs: List[np.ndarray] = []
        for start in range(0, n, top):
            chunk = images[start:start + top]
            m = chunk.shape[0]
            b = self.bucket_for(m)
            if m < b:
                pad = np.repeat(chunk[-1:], b - m, axis=0)
                chunk = np.concatenate([chunk, pad], axis=0)
            with self._lock:
                probs = self._fn(b)(self.variables, jnp.asarray(chunk))
            outs.append(np.asarray(probs)[:m])
        return np.concatenate(outs, axis=0)


@dataclass
class _Pending:
    image: np.ndarray
    t: float
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None
    error: Optional[Exception] = None


class BatchAggregator:
    """Coalesce single-image requests into bucket-sized engine calls.

    Dispatch fires when `max_batch` requests are queued or the OLDEST
    pending request has waited `max_delay_ms`. `submit()` blocks the
    calling thread until its result is ready — the server front-end calls
    it from one thread per connection."""

    def __init__(self, engine: InferenceEngine, max_batch: Optional[int] = None,
                 max_delay_ms: float = 10.0):
        self.engine = engine
        self.max_batch = int(max_batch or engine.buckets[-1])
        self.max_delay = max_delay_ms / 1000.0
        self._pending: List[_Pending] = []
        self._shape = None
        self._cv = threading.Condition()
        self._stop = False
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()
        self.batches_dispatched = 0
        self.requests_served = 0

    def submit(self, image: np.ndarray, timeout: float = 30.0) -> np.ndarray:
        image = np.asarray(image, np.float32)
        if image.ndim == 2:
            image = image[..., None]
        if image.ndim != 3:
            raise ValueError(f"expected one (S, S[, C]) image, got "
                             f"shape {image.shape}")
        with self._cv:
            if self._shape is None:
                self._shape = image.shape
            elif image.shape != self._shape:
                # all coalesced requests must stack — reject early instead
                # of poisoning a whole batch
                raise ValueError(f"image shape {image.shape} != aggregator "
                                 f"shape {self._shape}")
            req = _Pending(image, time.monotonic())
            self._pending.append(req)
            self._cv.notify()
        if not req.event.wait(timeout):
            raise TimeoutError("inference request timed out")
        if req.error is not None:
            raise RuntimeError(f"batched inference failed: {req.error}")
        return req.result

    def _loop(self) -> None:
        while True:
            with self._cv:
                while not self._stop and not self._due_locked():
                    self._cv.wait(timeout=self.max_delay / 4 or 0.01)
                if self._stop and not self._pending:
                    return
                batch = self._pending[:self.max_batch]
                self._pending = self._pending[len(batch):]
            if not batch:
                continue
            # one bad request must not kill the worker thread: a dead loop
            # would strand every queued and future submit() in TimeoutError
            try:
                images = np.stack([r.image for r in batch])
                probs = self.engine.predict(images)
                self.batches_dispatched += 1
                self.requests_served += len(batch)
                for r, p in zip(batch, probs):
                    r.result = p
                    r.event.set()
            except Exception as exc:  # propagate to the waiting callers
                for r in batch:
                    r.error = exc
                    r.event.set()

    def _due_locked(self) -> bool:
        if not self._pending:
            return False
        if len(self._pending) >= self.max_batch:
            return True
        return time.monotonic() - self._pending[0].t >= self.max_delay

    def close(self) -> None:
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._worker.join(timeout=5.0)
