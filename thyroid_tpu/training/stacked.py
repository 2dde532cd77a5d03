"""Fold-stacked k-fold training — every fold in ONE jitted program.

The reference runs k-fold sequentially (one pl.Trainer per fold —
reference: src/experiment/kfold_experiment.py:358-377). On TPU the folds'
independence can instead be handed to the compiler: states, data caches and
metric states gain a leading FOLD axis, and the engine's scan-epoch program
(training/engine.py _scan_train_fn) is `jax.vmap`-ed over it. One dispatch
then advances ALL folds by one epoch:

- on a single chip the folds' per-step compute is batched together, which
  fills the MXU for small models / small batches (k× the work per kernel
  at ~the same launch/glue overhead);
- on a ('slice','data') mesh (parallel/multislice.py) the fold axis shards
  over 'slice', so each slice trains its own fold with gradient psums on
  its ICI group and nothing over DCN.

Semantics vs the sequential sweep (documented deviations):
- every fold runs the same number of epochs; early stopping acts on the
  MEAN monitored metric across folds (per-fold patience would desynchronise
  the single program);
- "test the best checkpoint" is preserved PER FOLD: a device-side snapshot
  keeps, for each fold independently, the state from that fold's own best
  epoch (a `jnp.where` select on the fold axis each improving epoch —
  matching the reference's per-fold ModelCheckpoint semantics,
  reference: src/experiment/kfold_experiment.py:285-316), and the test
  pass / checkpoint export run on those per-fold-best states.

Requires equal split shapes across folds (true for the rotating scheme
whenever k divides the corpus; StackedShapeError otherwise — callers fall
back to the sequential path).
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import ModelRegistry, cfg_get
from ..utils.logging import get_logger
from .engine import Trainer
from .metrics import finalize_metric_state, zero_metric_state

logger = get_logger(__name__)


class StackedShapeError(ValueError):
    """Fold splits have unequal shapes — stacking impossible."""


def _stack_leaves(trees: List[Any]) -> Any:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _broadcast_state(state: Any, k: int) -> Any:
    """All sequential folds init from the same seed, so the stacked initial
    state is the single state broadcast along a new fold axis."""
    return jax.tree.map(lambda x: jnp.broadcast_to(
        x[None], (k,) + x.shape), state)


def _index_pytree(tree: Any, i: int) -> Any:
    return jax.tree.map(lambda x: x[i], tree)


class StackedKFoldTrainer:
    """Train k folds of one model config simultaneously.

    train/val/test pipelines: one DevicePipeline per fold, equal shapes.
    Reuses a single Trainer instance for the step functions, optimizer,
    schedule and loss mode — so every loss strategy (CE / aux / DeiT /
    distillation with a shared teacher) works stacked unchanged."""

    def __init__(
        self,
        model_config: Any,
        training_config: Any,
        trainer_config: Any,
        train_pipelines: List[Any],
        val_pipelines: List[Any],
        test_pipelines: Optional[List[Any]] = None,
        output_dir: str | Path = "outputs",
        teacher_fn: Optional[Callable] = None,
        distillation_config: Any = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        slice_axis: str = "slice",
    ):
        self.k = len(train_pipelines)
        if self.k < 1:
            raise ValueError("need at least one fold")
        for pipes in (train_pipelines, val_pipelines, test_pipelines or []):
            shapes = {(p.cache.shape, p.labels.shape) for p in pipes}
            if len(shapes) > 1:
                raise StackedShapeError(
                    f"fold shapes differ: {sorted(map(str, shapes))} — "
                    "stacked k-fold needs k | corpus size; use the "
                    "sequential path")
        self.train_pipelines = train_pipelines
        self.val_pipelines = val_pipelines
        self.test_pipelines = test_pipelines
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)

        self.trainer = Trainer(
            ModelRegistry.create_model(model_config),
            model_config, training_config,
            trainer_config,
            steps_per_epoch=train_pipelines[0].steps_per_epoch(),
            output_dir=self.output_dir,
            teacher_fn=teacher_fn,
            distillation_config=distillation_config,
        )
        self.cfg = self.trainer.cfg

        sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(mesh, P(slice_axis))
        self._sharding = sharding

        def put(tree):
            return jax.device_put(tree, sharding) if sharding is not None \
                else tree

        self.states = put(_broadcast_state(self.trainer.state, self.k))
        self.train_caches = put(jnp.stack([p.cache for p in train_pipelines]))
        self.train_labels = put(jnp.stack([p.labels for p in train_pipelines]))
        self.val_caches = put(jnp.stack([p.cache for p in val_pipelines]))
        self.val_labels = put(jnp.stack([p.labels for p in val_pipelines]))
        self._train_fn = None
        self._eval_fn = None
        self._eval_fns = {}

    # ------------------------------------------------------------------
    def _make_train_fn(self, n_steps: int):
        t = self.trainer
        pipe0 = self.train_pipelines[0]
        bs, n = pipe0.batch_size, pipe0.n

        def one_epoch(state, mstate, key, alpha, cache, labels):
            # mirror of Trainer._scan_train_fn.epoch_fn with the fold's
            # cache/labels as arguments instead of pipeline closure state
            perm_key, aug_key = jax.random.split(key)
            order = jax.random.permutation(perm_key, n)
            idx = jnp.take(order, jnp.arange(n_steps * bs) % n,
                           axis=0).reshape(n_steps, bs)

            def body(carry, xs):
                state, mstate = carry
                i, idx_b = xs
                img = pipe0._make_batch(idx_b, jax.random.fold_in(aug_key, i),
                                        augment=True, cache=cache)
                lbl = jnp.take(labels, idx_b, axis=0)
                w = jnp.ones((bs,), jnp.float32)
                step_rng = jax.random.fold_in(key, 10_000 + i)
                state, mstate, score1 = t._train_step_impl(
                    state, mstate, img, lbl, w, step_rng, alpha)
                return (state, mstate), (score1, lbl)

            (state, mstate), (scores, lbls) = jax.lax.scan(
                body, (state, mstate), (jnp.arange(n_steps), idx))
            return state, mstate, scores, lbls

        vf = jax.vmap(one_epoch, in_axes=(0, 0, 0, None, 0, 0))
        return jax.jit(vf, donate_argnums=(0, 1))

    def _make_eval_fn(self, n_steps: int, pipe0):
        t = self.trainer
        bs, n = pipe0.batch_size, pipe0.n

        def one_eval(variables, mstate, cache, labels):
            pos = jnp.arange(n_steps * bs)
            idx = jnp.minimum(pos, n - 1).reshape(n_steps, bs)
            wts = (pos < n).astype(jnp.float32).reshape(n_steps, bs)
            key0 = jax.random.PRNGKey(0)

            def body(mstate, xs):
                idx_b, w = xs
                img = pipe0._make_batch(idx_b, key0, augment=False,
                                        cache=cache)
                lbl = jnp.take(labels, idx_b, axis=0)
                mstate, score1 = t._eval_step_impl(variables, mstate,
                                                   img, lbl, w)
                return mstate, (score1, lbl)

            mstate, (scores, lbls) = jax.lax.scan(body, mstate, (idx, wts))
            return mstate, scores, lbls, wts

        vf = jax.vmap(one_eval, in_axes=(0, 0, 0, 0))
        return jax.jit(vf, donate_argnums=(1,))

    # ------------------------------------------------------------------
    def _zero_mstates(self, aux: bool = True):
        keys = self.trainer._aux_keys if aux else ()
        return _stack_leaves([zero_metric_state(keys)] * self.k)

    def _finalize_per_fold(self, mstates, scores, lbls, wts=None,
                           prefix: str = "") -> List[Dict[str, float]]:
        mstates, scores, lbls = jax.device_get((mstates, scores, lbls))
        wts = jax.device_get(wts) if wts is not None else None
        out = []
        for f in range(self.k):
            ms = _index_pytree(mstates, f)
            sc = [np.asarray(scores[f]).reshape(-1)]
            lb = [np.asarray(lbls[f]).reshape(-1)]
            wt = [np.asarray(wts[f]).reshape(-1)] if wts is not None else None
            out.append(finalize_metric_state(ms, sc, lb, wt, prefix=prefix))
        return out

    def train_epoch(self, epoch: int, rng: jax.Array) -> List[Dict[str, float]]:
        if self._train_fn is None:
            self._train_fn = self._make_train_fn(
                self.train_pipelines[0].steps_per_epoch())
        alpha = jnp.float32(self.trainer._alpha_for_epoch(epoch))
        keys = jnp.stack([rng] * self.k)   # sequential folds share the seed
        mstates = self._zero_mstates()
        self.states, mstates, scores, lbls = self._train_fn(
            self.states, mstates, keys, alpha,
            self.train_caches, self.train_labels)
        wts = jnp.ones_like(scores)
        return self._finalize_per_fold(mstates, scores, lbls, wts,
                                       prefix="train_")

    def eval_epoch(self, caches, labels, pipe0,
                   prefix: str = "val_") -> List[Dict[str, float]]:
        # cache compiled eval programs by data geometry, not pipeline object
        # identity — val and test often share shapes (rotating folds with
        # k | corpus), and reset() swaps same-shape corpora; both reuse the
        # compiled program (compiles cost 1-5 min under axon)
        key = (pipe0.steps_per_epoch(), pipe0.batch_size, pipe0.n)
        self._eval_fn = self._eval_fns.get(key)
        if self._eval_fn is None:
            self._eval_fn = self._make_eval_fn(pipe0.steps_per_epoch(), pipe0)
            self._eval_fns[key] = self._eval_fn
        # stacked variables: the fold axis simply rides the param leaves.
        # With EMA on, evaluate the shadow weights — mirrors
        # Trainer.evaluate(use_ema=True) semantics for the stacked path.
        params = self.states.params
        if getattr(self.states, "ema_params", None) is not None:
            params = self.states.ema_params
        variables = {"params": params}
        if self.states.batch_stats is not None:
            variables["batch_stats"] = self.states.batch_stats
        mstates = self._zero_mstates(aux=False)
        mstates, scores, lbls, wts = self._eval_fn(
            variables, mstates, caches, labels)
        return self._finalize_per_fold(mstates, scores, lbls, wts,
                                       prefix=prefix)

    _eval_fns: Dict[Any, Any]

    # ------------------------------------------------------------------
    def reset(self, train_pipelines: List[Any], val_pipelines: List[Any],
              test_pipelines: Optional[List[Any]] = None) -> None:
        """Swap in new SAME-SHAPE fold data and re-initialise fold states
        from the original init — the already-compiled train/eval programs
        are reused (data enters them as arguments). For sweeps that retrain
        the same model on several corpora (e.g. the pretraining-gap
        difficulty ablation) without paying the 1-5 min axon recompile per
        corpus. Pipelines must share batch/img/aug geometry with the
        originals; shape mismatches raise StackedShapeError."""
        want = (self.train_pipelines[0].cache.shape,
                self.train_pipelines[0].labels.shape)
        got = (train_pipelines[0].cache.shape, train_pipelines[0].labels.shape)
        if want != got or len(train_pipelines) != self.k:
            raise StackedShapeError(
                f"reset needs identical fold geometry: had {want} x{self.k}, "
                f"got {got} x{len(train_pipelines)}")
        self.train_pipelines = train_pipelines
        self.val_pipelines = val_pipelines
        self.test_pipelines = test_pipelines
        put = (lambda t: jax.device_put(t, self._sharding)) \
            if self._sharding is not None else jax.device_put
        self.states = put(_broadcast_state(self.trainer.state, self.k))
        self.train_caches = put(jnp.stack([p.cache for p in train_pipelines]))
        self.train_labels = put(jnp.stack([p.labels for p in train_pipelines]))
        self.val_caches = put(jnp.stack([p.cache for p in val_pipelines]))
        self.val_labels = put(jnp.stack([p.labels for p in val_pipelines]))

    # ------------------------------------------------------------------
    def export_fold_checkpoints(
        self,
        root: str | Path,
        model_name: str,
        model_config: Any = None,
        extra_metadata: Optional[Dict[str, Any]] = None,
    ) -> List[Path]:
        """Slice the stacked (post-`fit` best) states into per-fold
        checkpoints in the sequential layout
        `{root}/{name}/fold_{f}/checkpoints/{name}-best.ckpt` — the layout
        `scripts/run_ensemble_kfold_evaluation.py` and the confusion/ROC
        generator consume (reference trains folds sequentially and gets this
        for free from BestCheckpointCallback; the stacked path exports it)."""
        from types import SimpleNamespace

        from .checkpoint import save_checkpoint

        root = Path(root)
        states_host = jax.device_get(self.states)
        paths = []
        for f in range(self.k):
            st = _index_pytree(states_host, f)
            params = st.params
            # EMA shadow weights are what eval_epoch scored — export those
            if getattr(st, "ema_params", None) is not None:
                params = st.ema_params
            state = SimpleNamespace(params=params,
                                    batch_stats=st.batch_stats,
                                    step=int(np.asarray(st.step)))
            meta = {"model_name": model_name, "fold": f + 1,
                    "stacked_export": True}
            if model_config is not None:
                meta["model_config"] = (model_config if isinstance(
                    model_config, dict) else dict(model_config))
            if extra_metadata:
                meta.update(extra_metadata)
            path = (root / model_name / f"fold_{f + 1}" / "checkpoints"
                    / f"{model_name}-best.ckpt")
            path.parent.mkdir(parents=True, exist_ok=True)
            save_checkpoint(path, state, metadata=meta)
            paths.append(path)
        return paths

    # ------------------------------------------------------------------
    def fit(self) -> List[Dict[str, Any]]:
        """Run the stacked sweep; returns one result dict per fold with
        final val_* metrics, test_* metrics (best-epoch states), history."""
        monitor = self.cfg.monitor_metric
        mode = self.cfg.monitor_mode
        patience = self.cfg.early_stopping_patience
        root_rng = jax.random.PRNGKey(self.cfg.seed)
        best_mean = None
        best_snap = None
        # per-fold running best of the monitored metric (host scalars; the
        # state selection itself stays on device) + each fold's best epoch
        sign = 1.0 if mode == "max" else -1.0
        best_vec = np.full((self.k,), -np.inf)
        best_epoch_vec = np.full((self.k,), -1, dtype=int)
        bad = 0
        history: List[List[Dict[str, float]]] = []
        epochs = self.trainer.epochs
        for epoch in range(epochs):
            t0 = time.time()
            rng = jax.random.fold_in(root_rng, epoch)
            fold_metrics = self.train_epoch(epoch, rng)
            val_metrics = self.eval_epoch(self.val_caches, self.val_labels,
                                          self.val_pipelines[0], "val_")
            for fm, vm in zip(fold_metrics, val_metrics):
                fm.update(vm)
                fm["epoch"] = epoch
                fm["time_s"] = time.time() - t0
            history.append(fold_metrics)
            raw_vals = np.array(
                [np.nan if m.get(monitor) is None else float(m[monitor])
                 for m in fold_metrics])
            vals = raw_vals[np.isfinite(raw_vals)]
            mean_v = float(np.mean(vals)) if vals.size else None
            logger.info("stacked epoch %d: mean %s=%s", epoch, monitor,
                        None if mean_v is None else round(mean_v, 4))
            # per-fold improvement mask (NaN compares false → never improves)
            with np.errstate(invalid="ignore"):
                fold_improved = sign * raw_vals > best_vec
            if fold_improved.any():
                best_vec = np.where(fold_improved, sign * raw_vals, best_vec)
                best_epoch_vec = np.where(fold_improved, epoch, best_epoch_vec)
                # snapshot the eval-relevant leaves ON DEVICE, selecting only
                # the improved folds with a jnp.where on the fold axis (the
                # reference's per-fold ModelCheckpoint semantics). A
                # jax.device_get here costs a multi-GB host readback over
                # the axon tunnel (~50 MB/s) on EVERY improving epoch —
                # measured 60-80 s/epoch for stacked swin_tiny+EMA, vs ~6 s
                # for the train+eval dispatches themselves. opt_state is
                # excluded: post-fit only eval/test/export run, which need
                # params/EMA/batch_stats (+ step for export metadata);
                # resuming OPTIMISATION from self.states after fit() would
                # pair best params with last-epoch opt_state — use the
                # engine's sequential path for that.
                current = {"params": self.states.params,
                           "ema_params": self.states.ema_params,
                           "batch_stats": self.states.batch_stats,
                           "step": self.states.step}
                if best_snap is None:
                    best_snap = jax.tree.map(jnp.copy, current)
                else:
                    mask = jnp.asarray(fold_improved)

                    def sel(new, old):
                        m = mask.reshape((self.k,) + (1,) * (new.ndim - 1))
                        return jnp.where(m, new, old)

                    best_snap = jax.tree.map(sel, current, best_snap)
            # early stopping still acts on the MEAN monitor (documented
            # deviation: per-fold patience would desynchronise the program)
            mean_improved = mean_v is not None and (
                best_mean is None or
                (mean_v > best_mean if mode == "max" else mean_v < best_mean))
            if mean_improved:
                best_mean, bad = mean_v, 0
            else:
                bad += 1
            if patience and bad >= patience:
                logger.info("stacked early stop at epoch %d", epoch)
                break
        if best_snap is not None:
            self.states = self.states.replace(
                params=best_snap["params"],
                ema_params=best_snap["ema_params"],
                batch_stats=best_snap["batch_stats"],
                step=best_snap["step"])

        results: List[Dict[str, Any]] = []
        test_metrics = None
        if self.test_pipelines:
            tc = jnp.stack([p.cache for p in self.test_pipelines])
            tl = jnp.stack([p.labels for p in self.test_pipelines])
            if self._sharding is not None:
                tc = jax.device_put(tc, self._sharding)
                tl = jax.device_put(tl, self._sharding)
            test_metrics = self.eval_epoch(tc, tl, self.test_pipelines[0],
                                           "test_")
        last = history[-1] if history else [{} for _ in range(self.k)]
        for f in range(self.k):
            be = int(best_epoch_vec[f])
            best_row_f = history[be][f] if 0 <= be < len(history) else last[f]
            r: Dict[str, Any] = {}
            r.update({k: v for k, v in best_row_f.items()
                      if k.startswith("val_")})
            if test_metrics is not None:
                r.update(test_metrics[f])
            r["best_val_metric"] = best_row_f.get(monitor)
            r["best_epoch"] = be
            r["epochs_trained"] = len(history)
            r["stacked"] = True
            r["history"] = [row[f] for row in history]
            results.append(r)
        return results
