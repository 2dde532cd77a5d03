"""Checkpointing (Orbax) + best-checkpoint tracking + teacher loading.

Replaces:
- PL ModelCheckpoint / BestCheckpointCallback (reference:
  src/utils/training.py:177-306 — best copy to checkpoints/{model}-best.ckpt
  with a -latest alias, lookup and cleanup helpers)
- TeacherModelLoader / EnsembleTeacher (reference: src/utils/models.py:22-325
  — checkpoint → frozen teacher, metric extraction, ensemble weighting)

Checkpoints store {params, batch_stats, step} plus a JSON metadata sidecar
(metrics, config, distillation info — reference persists distillation config
into ckpts at lightning_modules.py:1149-1156).
"""
from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from ..models import ModelRegistry, cfg_get
from ..models.base import create_and_init


def _checkpointer() -> ocp.PyTreeCheckpointer:
    return ocp.PyTreeCheckpointer()


def save_checkpoint(
    path: str | Path,
    state: Any,
    metadata: Optional[Dict[str, Any]] = None,
    include_opt_state: bool = False,
) -> Path:
    """Save params/batch_stats/step (+ metadata.json sidecar). With
    `include_opt_state` the optimizer state is stored too, enabling exact
    training resume — a capability the reference lacks (SURVEY §5.4: "no
    mid-epoch resume anywhere")."""
    path = Path(path).absolute()
    if path.exists():
        shutil.rmtree(path)
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats)
        if state.batch_stats is not None else {},
        "step": int(state.step),
    }
    if include_opt_state:
        payload["opt_state"] = jax.device_get(state.opt_state)
        # exact resume must also carry the EMA shadow weights — without
        # them a resumed run silently tracks EMA from the fresh init
        if getattr(state, "ema_params", None) is not None:
            payload["ema_params"] = jax.device_get(state.ema_params)
    _checkpointer().save(path, payload)
    if metadata is not None:
        with open(path / "metadata.json", "w") as f:
            json.dump(metadata, f, indent=2, default=str)
    return path


def load_checkpoint(path: str | Path) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """→ (variables dict {params[, batch_stats]}, metadata)."""
    path = Path(path).absolute()
    payload = _checkpointer().restore(path)
    variables: Dict[str, Any] = {"params": payload["params"]}
    if payload.get("batch_stats"):
        variables["batch_stats"] = payload["batch_stats"]
    meta_path = path / "metadata.json"
    metadata = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return variables, metadata


class BestCheckpointManager:
    """Monitors a metric; keeps top-k + last; maintains
    checkpoints/{model}-best and -latest aliases (reference:
    src/utils/training.py:177-245 BestCheckpointCallback semantics)."""

    def __init__(
        self,
        checkpoint_dir: str | Path,
        model_name: str,
        monitor: str = "val_acc",
        mode: str = "max",
        save_top_k: int = 3,
        save_last: bool = True,
    ):
        self.dir = Path(checkpoint_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.model_name = model_name
        self.monitor = monitor
        self.mode = mode
        self.save_top_k = save_top_k
        self.save_last = save_last
        self.kept: List[Tuple[float, Path]] = []   # (metric, path)

    def _better(self, a: float, b: float) -> bool:
        return a > b if self.mode == "max" else a < b

    @property
    def best_metric(self) -> Optional[float]:
        return self.kept[0][0] if self.kept else None

    @property
    def best_path(self) -> Optional[Path]:
        return self.kept[0][1] if self.kept else None

    def step(self, state: Any, metrics: Dict[str, float], epoch: int,
             extra_metadata: Optional[Dict[str, Any]] = None) -> bool:
        """Save if this epoch ranks in the top-k. Returns True if new best."""
        value = metrics.get(self.monitor)
        if value is None or not np.isfinite(value):
            return False
        metadata = {"epoch": epoch, "metrics": metrics,
                    "monitor": self.monitor, **(extra_metadata or {})}
        if self.save_last:
            save_checkpoint(self.dir / f"{self.model_name}-latest.ckpt",
                            state, metadata)
        in_top_k = len(self.kept) < self.save_top_k or self._better(
            value, self.kept[-1][0])
        is_best = not self.kept or self._better(value, self.kept[0][0])
        if in_top_k:
            path = self.dir / f"{self.model_name}-epoch{epoch:03d}-{value:.4f}.ckpt"
            save_checkpoint(path, state, metadata)
            self.kept.append((value, path))
            self.kept.sort(key=lambda kv: kv[0], reverse=(self.mode == "max"))
            for _, stale in self.kept[self.save_top_k:]:
                shutil.rmtree(stale, ignore_errors=True)
            self.kept = self.kept[: self.save_top_k]
        if is_best:
            best = self.dir / f"{self.model_name}-best.ckpt"
            if best.exists():
                shutil.rmtree(best)
            shutil.copytree(self.kept[0][1], best)
        return is_best


def get_best_checkpoint(checkpoint_dir: str | Path, model_name: str) -> Optional[Path]:
    """reference: src/utils/training.py:248-279."""
    p = Path(checkpoint_dir) / f"{model_name}-best.ckpt"
    return p if p.exists() else None


def cleanup_old_checkpoints(checkpoint_dir: str | Path, model_name: str,
                            keep: int = 3) -> int:
    """Delete all but the newest `keep` non-alias checkpoints
    (reference: src/utils/training.py:281-306)."""
    d = Path(checkpoint_dir)
    cands = sorted(
        [p for p in d.glob(f"{model_name}-epoch*.ckpt") if p.is_dir()],
        key=lambda p: p.stat().st_mtime, reverse=True)
    removed = 0
    for p in cands[keep:]:
        shutil.rmtree(p, ignore_errors=True)
        removed += 1
    return removed


# ---------------------------------------------------------------------------
# teacher loading (reference: src/utils/models.py)
# ---------------------------------------------------------------------------

def load_teacher(
    checkpoint_path: str | Path,
    model_config: Any,
) -> Tuple[Any, Dict[str, Any], Dict[str, Any]]:
    """Restore a frozen teacher → (module, variables, metadata)."""
    module = ModelRegistry.create_model(model_config)
    variables, metadata = load_checkpoint(checkpoint_path)
    return module, variables, metadata


def make_teacher_fn(
    module: Any, variables: Dict[str, Any]
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Frozen teacher forward (eval mode, params constant under grad)."""

    @jax.jit
    def teacher_fn(x: jnp.ndarray) -> jnp.ndarray:
        out = module.apply(variables, x, train=False)
        return out[0] if isinstance(out, tuple) else out

    return teacher_fn


def make_ensemble_teacher_fn(
    members: Sequence[Tuple[Any, Dict[str, Any]]],
    weights: Optional[Sequence[float]] = None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Weighted-logit-average ensemble teacher (reference:
    src/utils/models.py:231-283 EnsembleTeacher)."""
    if weights is None:
        weights = [1.0 / len(members)] * len(members)
    w = [float(x) for x in weights]
    total = sum(w)
    w = [x / total for x in w]

    @jax.jit
    def teacher_fn(x: jnp.ndarray) -> jnp.ndarray:
        acc = None
        for (module, variables), wi in zip(members, w):
            out = module.apply(variables, x, train=False)
            if isinstance(out, tuple):
                out = out[0]
            acc = out * wi if acc is None else acc + out * wi
        return acc

    return teacher_fn


def create_teacher_from_config(distillation_cfg: Any) -> Callable:
    """Config-driven teacher factory (reference: src/utils/models.py:190-228):
    single `teacher_checkpoint`+`teacher_model`, or `teacher_checkpoints`
    list (+ optional `teacher_weights`) for an ensemble."""
    ckpts = cfg_get(distillation_cfg, "teacher_checkpoints", None)
    if ckpts:
        model_cfgs = cfg_get(distillation_cfg, "teacher_models", None)
        members = []
        for i, ck in enumerate(ckpts):
            mc = model_cfgs[i] if model_cfgs else _infer_model_config_from_path(ck)
            module, variables, _ = load_teacher(ck, mc)
            members.append((module, variables))
        return make_ensemble_teacher_fn(
            members, cfg_get(distillation_cfg, "teacher_weights", None))
    ckpt = cfg_get(distillation_cfg, "teacher_checkpoint", None)
    if ckpt is None:
        raise ValueError("distillation config carries no teacher checkpoint")
    mc = cfg_get(distillation_cfg, "teacher_model", None) or \
        _infer_model_config_from_path(ckpt)
    module, variables, _ = load_teacher(ckpt, mc)
    return make_teacher_fn(module, variables)


def _infer_model_config_from_path(path: str | Path) -> Dict[str, Any]:
    """Name auto-detect from the checkpoint filename (reference:
    src/utils/models.py:154-162 does the same by substring)."""
    stem = Path(path).name.lower()
    for names in (ModelRegistry.list_models("cnn") + ModelRegistry.list_models("vit")):
        if names in stem:
            return {"name": names}
    raise ValueError(f"cannot infer teacher architecture from path {path}")


def restore_ensemble(ensemble: Any, checkpoints: Sequence[str | Path]) -> Any:
    """Load member variables into a CNNEnsemble shell (built by the registry)
    from per-member checkpoints (reference flow:
    src/models/ensemble/cnn_ensemble.py:264 create_ensemble_from_best_models)."""
    if len(checkpoints) != len(ensemble.modules):
        raise ValueError(
            f"{len(ensemble.modules)} members but {len(checkpoints)} checkpoints")
    ensemble.variables = [load_checkpoint(c)[0] for c in checkpoints]
    return ensemble
