"""Device mesh construction and sharding helpers.

This is the TPU-native replacement for the reference's device management and
(unused) PL distributed knobs (reference: src/utils/training.py:26-151,
configs/trainer/default.yaml strategy/devices/num_nodes). Strategy:

- a `jax.sharding.Mesh` with a `data` axis (batch parallel over ICI) and an
  optional `model` axis (param sharding for the largest variants);
- train/eval steps are `jax.jit`-ed with NamedSharding annotations so XLA
  inserts the psum/all-gather collectives over ICI;
- scale-out across folds/models is embarrassingly parallel (one process per
  sweep job, matching reference scripts/run_all_models_quick_test.py:64-71)
  and needs no collectives (DCN only).
"""
from __future__ import annotations

import math
from typing import Mapping, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    mesh_shape: Optional[Mapping[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh. Default: all local devices on one `data` axis."""
    devices = list(devices if devices is not None else jax.devices())
    if not mesh_shape:
        mesh_shape = {"data": len(devices)}
    axis_names = tuple(mesh_shape.keys())
    shape = tuple(mesh_shape.values())
    n = math.prod(shape)
    if n > len(devices):
        raise ValueError(f"mesh {dict(mesh_shape)} needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Place a pytree of host arrays with the batch dim sharded over `data`."""
    sh = batch_sharding(mesh, data_axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def fsdp_param_sharding(mesh: Mesh, model_axis: str, params) -> object:
    """Per-leaf NamedSharding pytree: shard the largest divisible axis of each
    ≥2D param over `model_axis`, replicate the rest. A simple, shape-driven
    FSDP-style layout — adequate for this zoo's ≤200M-param models."""
    size = mesh.shape[model_axis]

    def spec_for(x) -> NamedSharding:
        if x.ndim < 2:
            return NamedSharding(mesh, P())
        dims = sorted(range(x.ndim), key=lambda d: x.shape[d], reverse=True)
        for d in dims:
            if x.shape[d] % size == 0 and x.shape[d] >= size:
                spec = [None] * x.ndim
                spec[d] = model_axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, params)


def local_device_count() -> int:
    return jax.local_device_count()


def device_info() -> dict:
    """Device summary table data (reference: src/utils/training.py:79-113)."""
    devs = jax.devices()
    return {
        "platform": devs[0].platform,
        "device_kind": getattr(devs[0], "device_kind", "unknown"),
        "device_count": len(devs),
        "local_device_count": jax.local_device_count(),
        "process_index": jax.process_index(),
        "default_backend": jax.default_backend(),
    }
