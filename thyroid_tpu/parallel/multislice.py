"""Multi-slice scale-out for the k-fold x model sweep.

SURVEY §2.8: the reference scales its sweep by launching one subprocess per
model config (reference: scripts/run_all_models_quick_test.py:64-71) — there
is no inner communication between jobs. The TPU-native equivalent keeps that
property explicit in the mesh: a ('slice', 'data') mesh where

- 'data'  = chips inside one slice, joined by ICI. Batch-parallel gradient
  reduction (XLA-inserted psum) rides this axis only.
- 'slice' = independent slices, joined by DCN. Folds/models are partitioned
  across it; NO collective ever crosses it during training, so DCN carries
  zero training traffic. (Cross-slice aggregation happens on host, once, by
  merging the per-slice summary JSONs.)

Two usage modes:

1. **Process-level** (matches the reference's subprocess scale-out): each
   slice runs its own process; `partition_folds` assigns folds, the k-fold
   experiment runs its subset, and `merge_slice_summaries` combines the
   per-slice `kfold_summary_*.json` files into the canonical aggregate.

2. **Single-program stacked** (SPMD over both axes): all folds train in ONE
   jitted program — states/batches gain a leading fold axis sharded over
   'slice', the per-fold step is `jax.vmap`-ed over it, and XLA partitions
   fold-independent compute with no cross-slice collectives. This is the
   idiomatic JAX formulation of "embarrassingly parallel": the independence
   is visible to the compiler instead of hidden in subprocesses.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence, Union

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def multislice_mesh(
    num_slices: int,
    data_per_slice: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    slice_axis: str = "slice",
    data_axis: str = "data",
) -> Mesh:
    """('slice', 'data') mesh: row = one slice's chips (ICI-contiguous).

    With real multi-slice hardware jax.devices() orders devices by slice, so
    reshaping (num_slices, data_per_slice) keeps each row within one slice and
    the 'data' axis entirely on ICI."""
    devices = list(devices if devices is not None else jax.devices())
    if data_per_slice is None:
        if len(devices) % num_slices:
            raise ValueError(
                f"{len(devices)} devices do not divide into {num_slices} slices")
        data_per_slice = len(devices) // num_slices
    n = num_slices * data_per_slice
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(num_slices, data_per_slice)
    # hard guarantee of the docstring's no-DCN-inside-'data' property: on
    # real multi-slice hardware every row must sit inside ONE physical
    # slice. A data_per_slice smaller than the hardware slice width would
    # otherwise silently build rows straddling slice boundaries and route
    # per-step gradient psums over DCN. (Virtual/CPU devices carry no
    # slice_index — nothing to check there.)
    for row in dev_array:
        slice_ids = {getattr(d, "slice_index", None) for d in row}
        slice_ids.discard(None)
        if len(slice_ids) > 1:
            raise ValueError(
                f"mesh row {[str(d) for d in row]} spans physical slices "
                f"{sorted(slice_ids)} — the '{data_axis}' axis would cross "
                "DCN; use data_per_slice = chips-per-slice (or a divisor "
                "aligned to slice boundaries)")
    return Mesh(dev_array, (slice_axis, data_axis))


def partition_folds(num_folds: int, num_slices: int, slice_index: int) -> List[int]:
    """Round-robin partition of 1-based fold ids across slices.

    Deterministic and balanced: fold f goes to slice (f-1) % num_slices."""
    if not 0 <= slice_index < num_slices:
        raise ValueError(f"slice_index {slice_index} not in [0, {num_slices})")
    return [f for f in range(1, num_folds + 1)
            if (f - 1) % num_slices == slice_index]


def merge_slice_summaries(
    summaries: Sequence[Union[str, Path, Dict[str, Any]]],
) -> Dict[str, Any]:
    """Combine per-slice k-fold summaries into one canonical aggregate.

    Each input is a summary dict (or a path to one) as written by
    KFoldExperiment.log_results — the raw_fold_results lists are concatenated
    and the avg_/std_ metrics recomputed over all successful folds, exactly
    as a single-process run would have produced."""
    loaded: List[Dict[str, Any]] = []
    for s in summaries:
        if isinstance(s, (str, Path)):
            with open(s) as f:
                loaded.append(json.load(f))
        else:
            loaded.append(dict(s))
    if not loaded:
        raise ValueError("no summaries to merge")
    folds: List[Dict[str, Any]] = []
    for s in loaded:
        folds.extend(s.get("raw_fold_results", []))
    folds.sort(key=lambda r: r.get("fold", 0))
    valid = [r for r in folds if "error" not in r]
    merged: Dict[str, Any] = {}
    if valid:
        for key in valid[0]:
            values = [r[key] for r in valid
                      if isinstance(r.get(key), (int, float))
                      and np.isfinite(r.get(key))]
            if values:
                merged[f"avg_{key}"] = float(np.mean(values))
                merged[f"std_{key}"] = float(np.std(values))
    if not valid:
        # mirror KFoldExperiment.aggregate_results' all-failed sentinel so
        # downstream failure detection sees the same shape either way
        merged["status"] = "All folds failed or no metrics"
    merged["num_successful_folds"] = len(valid)
    # each slice reports the FULL sweep's total_folds (it knows num_folds);
    # taking the max, not the sum, keeps the canonical count
    merged["total_folds"] = max(
        [int(s.get("total_folds", 0)) for s in loaded] + [len(folds)])
    merged["raw_fold_results"] = folds
    merged["num_slices_merged"] = len(loaded)
    # carry identifying metadata from the first slice's summary
    for key in ("experiment_name", "model_name", "family",
                "student_model_name", "teacher_model_name"):
        if key in loaded[0]:
            merged[key] = loaded[0][key]
    return merged


# ----------------------------------------------------------------------
# single-program stacked mode


def stack_pytrees(trees: Sequence[Any]) -> Any:
    """Stack per-fold pytrees along a new leading fold axis."""
    return jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                        *trees)


def unstack_pytree(tree: Any, n: int) -> List[Any]:
    """Split a stacked pytree back into n per-fold pytrees (host arrays)."""
    leaves = jax.tree.map(np.asarray, tree)
    return [jax.tree.map(lambda x: x[i], leaves) for i in range(n)]


def stacked_step(
    step_fn: Callable,
    mesh: Mesh,
    slice_axis: str = "slice",
    data_axis: str = "data",
    donate: bool = True,
) -> Callable:
    """Lift a per-fold step into one jitted program over the whole mesh.

    step_fn(state, batch) -> (state, metrics) is the single-fold step (any
    pytrees). The returned function takes fold-stacked arguments:

      state leaves:  (num_folds, ...)            sharded P(slice)
      batch leaves:  (num_folds, per_fold_batch, ...) sharded P(slice, data)

    `jax.vmap` over the fold axis keeps every fold's compute independent;
    the P(slice) shardings partition the fold axis in CONTIGUOUS blocks
    (GSPMD blocking: 6 folds on 2 slices → folds 0-2 on slice 0, 3-5 on
    slice 1 — NOT the round-robin that `partition_folds` uses for process
    mode), so XLA's partitioner never materializes a cross-slice (DCN)
    collective — gradient psums stay inside each slice's 'data' (ICI)
    group. With more folds than slices each slice runs its block of folds
    as a vmapped batch (still one program).
    """
    state_sh = NamedSharding(mesh, P(slice_axis))
    batch_sh = NamedSharding(mesh, P(slice_axis, data_axis))
    vstep = jax.vmap(step_fn)
    return jax.jit(
        vstep,
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, state_sh),
        donate_argnums=(0,) if donate else (),
    )
