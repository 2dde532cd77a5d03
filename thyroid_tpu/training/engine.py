"""Training engine — one pjit-sharded functional engine replacing the
reference's three LightningModules + pl.Trainer
(reference: src/training/lightning_modules.py, src/training/train_cnn.py).

Loss strategies (plain CE / Inception aux / DeiT dual-head / distillation)
are data, not subclasses: the jitted train step closes over a `loss_mode`
and an optional frozen teacher. Batches arrive sharded over the mesh's data
axis; with params replicated, XLA inserts the psum for gradients over ICI —
no hand-written collectives (SURVEY §2.8's TPU-native equivalent).
"""
from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import cfg_get
from ..models.base import create_and_init
from ..parallel.mesh import batch_sharding, create_mesh, replicated
from ..utils.logging import get_logger
from ..utils.observe import MetricLogger, StepTimer
from .checkpoint import BestCheckpointManager
from ..ops.augment import mixup_cutmix
from .losses import (
    cross_entropy, distillation_loss, mixed_cross_entropy,
    progressive_alpha,
)
from .metrics import (
    finalize_metric_state, update_metric_state, zero_metric_state,
)
from .schedules import build_optimizer, build_schedule
from .train_state import TrainState, create_train_state

logger = get_logger(__name__)


@dataclass
class TrainerConfig:
    max_epochs: int = 100
    min_epochs: int = 1
    max_steps: int = -1
    model_axis: Optional[str] = None   # mesh axis for FSDP param sharding
    precision: str = "bf16"
    gradient_clip_val: Optional[float] = 1.0
    gradient_clip_algorithm: str = "norm"
    accumulate_grad_batches: int = 1
    log_every_n_steps: int = 50
    scan_epoch: bool = True     # lax.scan the whole epoch (one dispatch)
    check_val_every_n_epoch: int = 1
    limit_train_batches: float = 1.0
    limit_val_batches: float = 1.0
    limit_test_batches: float = 1.0
    enable_checkpointing: bool = True
    deterministic: bool = True
    mesh_shape: Optional[Dict[str, int]] = None
    data_axis: str = "data"
    monitor_metric: str = "val_acc"
    monitor_mode: str = "max"
    early_stopping_patience: Optional[int] = 10
    log_attention_every_n_epochs: int = 0   # >0: log attention-map images
    save_top_k: int = 3
    save_last: bool = True
    seed: int = 42

    @classmethod
    def from_config(cls, trainer_cfg: Any, training_cfg: Any) -> "TrainerConfig":
        kw = {}
        for f_ in cls.__dataclass_fields__:
            v = cfg_get(trainer_cfg, f_, None)
            if v is None:
                v = cfg_get(training_cfg, f_, None)
            if v is not None:
                kw[f_] = v
        return cls(**kw)


@dataclass
class FitResult:
    best_metric: Optional[float]
    best_checkpoint: Optional[Path]
    history: List[Dict[str, float]] = field(default_factory=list)
    stopped_epoch: int = 0


def _limit_batches(limit, full: int) -> int:
    """Lightning `limit_{train,val,test}_batches` semantics: an int is a
    BATCH COUNT (0 disables, 5 = five batches), a float is a fraction of
    the epoch (1.0 = everything)."""
    if isinstance(limit, bool) or limit is None:
        return full
    if isinstance(limit, int):
        return min(full, max(0, limit))
    if float(limit) < 1.0:
        return max(1, int(full * float(limit)))
    return full


class Trainer:
    """Builds the optimizer/state from configs and runs fit/validate/test."""

    def __init__(
        self,
        model: Any,
        model_config: Any,
        training_config: Any,
        trainer_config: Any = None,
        steps_per_epoch: int = 10,
        output_dir: str | Path = "outputs",
        teacher_fn: Optional[Callable] = None,
        distillation_config: Any = None,
        loss_mode: Optional[str] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
    ):
        self.model_config = model_config
        self.training_config = training_config
        self.cfg = TrainerConfig.from_config(trainer_config, training_config)
        # trainer.precision drives the compute dtype: rebuild the model with
        # dtype=bf16 unless the model config pins one explicitly. (Params and
        # optimizer state stay f32 — flax param_dtype default.)
        if self.cfg.precision == "bf16" and cfg_get(model_config, "dtype", None) is None:
            mc = model_config.to_dict() if hasattr(model_config, "to_dict") \
                else dict(model_config)
            mc["dtype"] = "bf16"
            from ..models import ModelRegistry

            model = ModelRegistry.create_model(mc)
            self.model_config = mc
        self.model = model
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.teacher_fn = teacher_fn
        self.distillation_config = distillation_config

        # loss-strategy selection is explicit config, not a name heuristic
        # (the reference dispatches LightningModule class by model-name
        # substring — kfold_experiment.py:69-87 — flagged in SURVEY §append.)
        if loss_mode is None:
            name = str(cfg_get(model_config, "name", ""))
            if teacher_fn is not None:
                loss_mode = "distillation"
            elif name.startswith("deit"):
                loss_mode = "deit"
            else:
                loss_mode = "ce"
        self.loss_mode = loss_mode

        self.label_smoothing = float(
            cfg_get(training_config, "label_smoothing",
                    cfg_get(cfg_get(training_config, "loss", {}) or {},
                            "label_smoothing", 0.0)) or 0.0)
        # Batch MixUp/CutMix (reference: vit_transforms.py:396-462) — applied
        # inside the jitted step; ignored under distillation (the teacher
        # targets follow the mixed images, but the class term would not).
        self.mixup_alpha = float(cfg_get(training_config, "mixup_alpha", 0.0) or 0.0)
        self.cutmix_alpha = float(cfg_get(training_config, "cutmix_alpha", 0.0) or 0.0)
        self.mixup_prob = float(cfg_get(training_config, "mixup_prob", 1.0) or 1.0)
        opt = cfg_get(training_config, "optimizer_params", {}) or {}
        if not opt and str(cfg_get(self.model_config, "architecture", "")) == "vit":
            # ViT side-channel fallback (reference: lightning_modules.py:329-338
            # loads configs/vit_optimizer_params.json when params are absent)
            side = Path(__file__).resolve().parents[2] / "configs" / \
                "vit_optimizer_params.json"
            if side.exists():
                opt = json.loads(side.read_text())
        sched = cfg_get(training_config, "scheduler_params", {}) or {}
        epochs = int(cfg_get(training_config, "epochs", self.cfg.max_epochs))
        self.epochs = min(epochs, self.cfg.max_epochs)
        base_lr = float(cfg_get(opt, "lr", 1e-4))
        self.schedule = build_schedule(
            base_lr=base_lr,
            steps_per_epoch=steps_per_epoch,
            epochs=self.epochs,
            warmup_epochs=int(cfg_get(sched, "warmup_epochs", 0) or 0),
            warmup_steps=int(cfg_get(sched, "warmup_steps", 0) or 0),
            eta_min=float(cfg_get(sched, "eta_min", 0.0) or 0.0),
            kind=cfg_get(sched, "name", "cosine"),
            step_size=cfg_get(sched, "step_size", None),
            gamma=cfg_get(sched, "gamma", None),
        )

        rng = jax.random.PRNGKey(self.cfg.seed)
        _, variables = create_and_init(self.model_config, rng)
        depth = int(cfg_get(model_config, "depth", 0) or 0) or \
            len(tuple(cfg_get(model_config, "depths", ()) or ())) or 12
        tx = build_optimizer(
            variables["params"], self.schedule,
            weight_decay=float(cfg_get(opt, "weight_decay", 1e-5)),
            beta1=float(cfg_get(opt, "beta1", 0.9)),
            beta2=float(cfg_get(opt, "beta2", 0.999)),
            eps=float(cfg_get(opt, "eps", 1e-8)),
            gradient_clip_val=self.cfg.gradient_clip_val,
            gradient_clip_algorithm=self.cfg.gradient_clip_algorithm,
            layer_decay=cfg_get(training_config, "layer_decay", None),
            num_layers=depth,
            accumulate_steps=self.cfg.accumulate_grad_batches,
            name=str(cfg_get(opt, "name", "adamw")),
        )
        ema_decay = cfg_get(training_config, "ema_decay", None)
        self.ema_decay = float(ema_decay) if ema_decay else None
        self.state = create_train_state(model, variables, tx,
                                        ema=self.ema_decay is not None)

        self.mesh = mesh
        if mesh is None and self.cfg.mesh_shape:
            self.mesh = create_mesh(self.cfg.mesh_shape)
        if self.mesh is not None:
            self.batch_sharding = batch_sharding(self.mesh, self.cfg.data_axis)
            ma = self.cfg.model_axis
            if ma and ma in self.mesh.shape and self.mesh.shape[ma] > 1:
                # FSDP: shard every ≥2-D state leaf (params, adam moments)
                # over the model axis; XLA inserts the all-gathers/reduce-
                # scatters over ICI (SURVEY §2.8 optional model axis)
                from ..parallel.mesh import fsdp_param_sharding

                shardings = fsdp_param_sharding(self.mesh, ma, self.state)
                self.state = jax.tree.map(
                    lambda x, s: jax.device_put(x, s), self.state, shardings)
            else:
                self.state = jax.device_put(self.state, replicated(self.mesh))
        else:
            self.batch_sharding = None

        self._aux_keys = (
            ("class_loss", "distillation_loss", "teacher_agreement")
            if self.loss_mode == "distillation" else ())
        # Metric state rides the jitted steps as a donated carry so the epoch
        # loop never syncs to host (round-1 bottleneck: ~100 ms dispatch RPC
        # per float() over the remote link).
        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=(0, 1))
        self._eval_step = jax.jit(self._eval_step_impl, donate_argnums=(1,))
        # epoch-level lax.scan programs, keyed by (kind, pipeline, n_steps);
        # the pipeline ref is kept in the value so id() can't be recycled
        self._scan_cache: Dict[tuple, tuple] = {}
        self._global_step = 0

    # ------------------------------------------------------------------
    def _forward_train(self, params, batch_stats, images, rng):
        variables = {"params": params}
        mutable = []
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        if mutable:
            outputs, updated = self.state.apply_fn(
                variables, images, train=True, rngs={"dropout": rng},
                mutable=mutable)
            return outputs, updated.get("batch_stats")
        outputs = self.state.apply_fn(variables, images, train=True,
                                      rngs={"dropout": rng})
        return outputs, None

    def _train_step_impl(self, state: TrainState, mstate, images, labels,
                         weights, rng, alpha):
        mix = (self.mixup_alpha > 0 or self.cutmix_alpha > 0) and \
            self.loss_mode != "distillation"
        if mix:
            rng, mix_rng = jax.random.split(rng)
            images, labels_a, labels_b, lam = mixup_cutmix(
                images, labels, mix_rng,
                mixup_alpha=self.mixup_alpha, cutmix_alpha=self.cutmix_alpha,
                prob=self.mixup_prob)

        def ce(lgts):
            if mix:
                return mixed_cross_entropy(lgts, labels_a, labels_b, lam,
                                           self.label_smoothing, weights)
            return cross_entropy(lgts, labels, self.label_smoothing, weights)

        teacher_logits = self.teacher_fn(images) if self.teacher_fn else None

        def loss_fn(params):
            outputs, new_bs = self._forward_train(params, state.batch_stats,
                                                  images, rng)
            aux: Dict[str, jnp.ndarray] = {}
            if self.loss_mode == "distillation":
                dcfg = self.distillation_config or {}
                loss, aux = distillation_loss(
                    outputs, teacher_logits, labels,
                    alpha=alpha,
                    temperature=float(cfg_get(dcfg, "temperature", 4.0)),
                    distillation_type=str(cfg_get(dcfg, "distillation_type", "soft")),
                    label_smoothing=self.label_smoothing,
                    weights=weights,
                )
                logits = outputs[0] if isinstance(outputs, tuple) else outputs
            elif self.loss_mode == "deit" and isinstance(outputs, tuple):
                loss = 0.5 * ce(outputs[0]) + 0.5 * ce(outputs[1])
                logits = (outputs[0] + outputs[1]) / 2.0
            elif isinstance(outputs, tuple):  # inception aux head
                main, aux_logits = outputs
                loss = ce(main) + 0.4 * ce(aux_logits)
                logits = main
            else:
                loss = ce(outputs)
                logits = outputs
            return loss, (logits, new_bs, aux)

        (loss, (logits, new_bs, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs,
                                          ema_decay=self.ema_decay)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        # accuracy vs the ORIGINAL labels (mixed labels only shape the loss)
        new_mstate, score1 = update_metric_state(
            mstate, probs, labels, weights, loss=loss, aux=aux)
        return new_state, new_mstate, score1

    def _eval_step_impl(self, variables, mstate, images, labels, weights):
        outputs = self.state.apply_fn(variables, images, train=False)
        if isinstance(outputs, tuple):
            outputs = outputs[0]
        loss = cross_entropy(outputs, labels, self.label_smoothing, weights)
        probs = jax.nn.softmax(outputs.astype(jnp.float32), axis=-1)
        return update_metric_state(mstate, probs, labels, weights, loss=loss)

    # ------------------------------------------------------------------
    def _alpha_for_epoch(self, epoch: int) -> float:
        dcfg = self.distillation_config or {}
        if self.loss_mode != "distillation":
            return 0.0
        if cfg_get(dcfg, "progressive", False):
            return progressive_alpha(epoch, cfg_get(dcfg, "alpha_schedule", None),
                                     float(cfg_get(dcfg, "alpha", 0.7)))
        return float(cfg_get(dcfg, "alpha", 0.7))

    # -- epoch-level lax.scan (round 2) ---------------------------------
    # One dispatch per EPOCH instead of one per step: permutation, batch
    # gather, augmentation, the train step, and metric accumulation all run
    # inside a single jitted scan over the HBM-resident split. Key folding
    # and wraparound padding reproduce DevicePipeline.epoch + the python
    # step loop bit-for-bit, so scan_epoch=False is a pure fallback.
    def _scan_train_fn(self, pipeline, n_steps: int):
        cache_key = ("train", id(pipeline), n_steps)
        hit = self._scan_cache.get(cache_key)
        if hit is not None:
            return hit[1]
        bs, n = pipeline.batch_size, pipeline.n
        shard = self.batch_sharding

        def epoch_fn(state, mstate, key, alpha):
            perm_key, aug_key = jax.random.split(key)
            order = jax.random.permutation(perm_key, n)
            idx = jnp.take(order, jnp.arange(n_steps * bs) % n,
                           axis=0).reshape(n_steps, bs)

            def body(carry, xs):
                state, mstate = carry
                i, idx_b = xs
                img = pipeline._make_batch(
                    idx_b, jax.random.fold_in(aug_key, i), augment=True)
                lbl = jnp.take(pipeline.labels, idx_b, axis=0)
                w = jnp.ones((bs,), jnp.float32)
                if shard is not None:
                    img = jax.lax.with_sharding_constraint(img, shard)
                    lbl = jax.lax.with_sharding_constraint(lbl, shard)
                    w = jax.lax.with_sharding_constraint(w, shard)
                step_rng = jax.random.fold_in(key, 10_000 + i)
                state, mstate, score1 = self._train_step_impl(
                    state, mstate, img, lbl, w, step_rng, alpha)
                return (state, mstate), (score1, lbl)

            (state, mstate), (scores, lbls) = jax.lax.scan(
                body, (state, mstate), (jnp.arange(n_steps), idx))
            return state, mstate, scores, lbls

        fn = jax.jit(epoch_fn, donate_argnums=(0, 1))
        self._scan_cache[cache_key] = (pipeline, fn)
        return fn

    def _scan_eval_fn(self, pipeline, n_steps: int):
        cache_key = ("eval", id(pipeline), n_steps)
        hit = self._scan_cache.get(cache_key)
        if hit is not None:
            return hit[1]
        bs, n = pipeline.batch_size, pipeline.n
        shard = self.batch_sharding

        def epoch_fn(variables, mstate):
            pos = jnp.arange(n_steps * bs)
            idx = jnp.minimum(pos, n - 1).reshape(n_steps, bs)
            wts = (pos < n).astype(jnp.float32).reshape(n_steps, bs)
            key0 = jax.random.PRNGKey(0)

            def body(mstate, xs):
                idx_b, w = xs
                img = pipeline._make_batch(idx_b, key0, augment=False)
                lbl = jnp.take(pipeline.labels, idx_b, axis=0)
                if shard is not None:
                    img = jax.lax.with_sharding_constraint(img, shard)
                    lbl = jax.lax.with_sharding_constraint(lbl, shard)
                    w = jax.lax.with_sharding_constraint(w, shard)
                mstate, score1 = self._eval_step_impl(variables, mstate,
                                                      img, lbl, w)
                return mstate, (score1, lbl)

            mstate, (scores, lbls) = jax.lax.scan(body, mstate, (idx, wts))
            return mstate, scores, lbls, wts

        fn = jax.jit(epoch_fn, donate_argnums=(1,))
        self._scan_cache[cache_key] = (pipeline, fn)
        return fn

    def train_epoch(self, pipeline, epoch: int, rng: jax.Array) -> Dict[str, float]:
        """One epoch with ZERO per-step host synchronisation: the metric
        state is a donated device carry; scores/labels stay device-resident
        and are read back once in finalize_metric_state. With scan_epoch
        (default) the whole epoch is ONE dispatched program."""
        mstate = zero_metric_state(self._aux_keys)
        scores: List = []
        lbls: List = []
        wts: List = []
        alpha = jnp.float32(self._alpha_for_epoch(epoch))
        full_batches = _limit_batches(self.cfg.limit_train_batches,
                                      pipeline.steps_per_epoch())
        max_batches = full_batches
        if 0 < self.cfg.max_steps:
            max_batches = min(max_batches,
                              self.cfg.max_steps - self._global_step)
        # scan only for the steady-state epoch length: a max_steps-truncated
        # final epoch would key a NEW whole-epoch program (1-5 min remote
        # compile here) just to run a few steps — the per-step path below
        # reuses the already-shaped _train_step for any truncation
        # the scan program hardcodes train-pipeline behavior (shuffle,
        # augment, weight-1 wraparound); an eval-style pipeline passed here
        # must take the per-step fallback, which honors pipeline.train
        if self.cfg.scan_epoch and hasattr(pipeline, "_make_batch") \
                and getattr(pipeline, "train", True) \
                and max_batches == full_batches and max_batches > 0:
            fn = self._scan_train_fn(pipeline, max_batches)
            self.state, mstate, sc, lb = fn(self.state, mstate, rng, alpha)
            self._global_step += max_batches
            return finalize_metric_state(
                mstate, [sc.reshape(-1)], [lb.reshape(-1)],
                [jnp.ones(sc.size, jnp.float32)], prefix="train_")
        for i, batch in enumerate(pipeline.epoch(rng)):
            if i >= max_batches or (0 < self.cfg.max_steps <= self._global_step):
                break
            step_rng = jax.random.fold_in(rng, 10_000 + i)
            self.state, mstate, score1 = self._train_step(
                self.state, mstate, batch.image, batch.label, batch.weight,
                step_rng, alpha)
            scores.append(score1)
            lbls.append(batch.label)
            wts.append(batch.weight)
            self._global_step += 1
        return finalize_metric_state(mstate, scores, lbls, wts, prefix="train_")

    def eval_epoch(self, pipeline, prefix: str = "val_",
                   use_ema: bool = False,
                   limit_fraction: Optional[float] = None) -> Dict[str, float]:
        mstate = zero_metric_state()
        scores: List = []
        lbls: List = []
        wts: List = []
        variables = self.state.variables(use_ema=use_ema)
        if limit_fraction is None:
            limit_fraction = self.cfg.limit_val_batches
        n_eval = _limit_batches(limit_fraction, pipeline.steps_per_epoch())
        if self.cfg.scan_epoch and hasattr(pipeline, "_make_batch"):
            fn = self._scan_eval_fn(pipeline, n_eval)
            mstate, sc, lb, w = fn(variables, mstate)
            return finalize_metric_state(
                mstate, [sc.reshape(-1)], [lb.reshape(-1)], [w.reshape(-1)],
                prefix=prefix)
        for i, batch in enumerate(pipeline.epoch(jax.random.PRNGKey(0))):
            if i >= n_eval:
                break
            mstate, score1 = self._eval_step(variables, mstate, batch.image,
                                             batch.label, batch.weight)
            scores.append(score1)
            lbls.append(batch.label)
            wts.append(batch.weight)
        return finalize_metric_state(mstate, scores, lbls, wts, prefix=prefix)

    def fit(self, train_pipeline, val_pipeline=None,
            extra_ckpt_metadata: Optional[Dict[str, Any]] = None) -> FitResult:
        model_name = str(cfg_get(self.model_config, "name", "model"))
        ckpt_mgr = None
        if self.cfg.enable_checkpointing:
            ckpt_mgr = BestCheckpointManager(
                self.output_dir / "checkpoints", model_name,
                monitor=self.cfg.monitor_metric, mode=self.cfg.monitor_mode,
                save_top_k=self.cfg.save_top_k, save_last=self.cfg.save_last)
        history: List[Dict[str, float]] = []
        metric_logger = MetricLogger(self.output_dir / "logs")
        step_timer = StepTimer()
        patience = self.cfg.early_stopping_patience
        bad_epochs = 0
        best = None
        stopped = 0
        root_rng = jax.random.PRNGKey(self.cfg.seed)
        for epoch in range(self.epochs):
            t0 = time.time()
            epoch_rng = jax.random.fold_in(root_rng, epoch)
            metrics = self.train_epoch(train_pipeline, epoch, epoch_rng)
            if val_pipeline is not None and \
                    (epoch + 1) % self.cfg.check_val_every_n_epoch == 0:
                metrics.update(self.eval_epoch(val_pipeline, "val_"))
            n_att = self.cfg.log_attention_every_n_epochs
            if n_att and val_pipeline is not None and (epoch + 1) % n_att == 0:
                self._log_attention_maps(metric_logger, val_pipeline, epoch)
            metrics["epoch"] = epoch
            metrics["lr"] = float(self.schedule(self._global_step))
            metrics["time_s"] = time.time() - t0
            step_timer.tick()
            metrics.update(step_timer.stats())
            metric_logger.log(metrics, step=epoch)
            history.append(metrics)
            logger.info(
                "epoch %d: %s", epoch,
                {k: round(v, 4) for k, v in metrics.items()
                 if isinstance(v, float)})
            monitored = metrics.get(self.cfg.monitor_metric)
            if ckpt_mgr is not None and monitored is not None:
                mc = self.model_config.to_dict() if hasattr(
                    self.model_config, "to_dict") else dict(self.model_config)
                meta = {"model_config": mc, **(extra_ckpt_metadata or {})}
                is_best = ckpt_mgr.step(self.state, metrics, epoch, meta)
                if is_best:
                    bad_epochs = 0
                    best = monitored
                else:
                    bad_epochs += 1
            elif monitored is not None:
                improved = best is None or (
                    monitored > best if self.cfg.monitor_mode == "max"
                    else monitored < best)
                if improved:
                    best, bad_epochs = monitored, 0
                else:
                    bad_epochs += 1
            stopped = epoch
            if patience and bad_epochs >= patience and \
                    epoch + 1 >= self.cfg.min_epochs:
                logger.info("early stopping at epoch %d", epoch)
                break
            if 0 < self.cfg.max_steps <= self._global_step:
                break
        metric_logger.close()
        with open(self.output_dir / "history.json", "w") as f:
            json.dump(history, f, indent=2)
        return FitResult(
            best_metric=best if best is not None else (
                ckpt_mgr.best_metric if ckpt_mgr else None),
            best_checkpoint=ckpt_mgr.best_path if ckpt_mgr else None,
            history=history,
            stopped_epoch=stopped,
        )

    def _log_attention_maps(self, metric_logger, val_pipeline,
                            epoch: int) -> None:
        """Attention-map image logging during training (reference: wandb
        logging in ThyroidViTModule — lightning_modules.py:661-706). Uses the
        models' capture path; silently skips models without attention."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            from ..analysis.attention import (
                cls_attention_heatmap, collect_attention_maps)

            batch = next(iter(val_pipeline.epoch(jax.random.PRNGKey(0))))
            images = batch.image[:4]
            variables = self.state.variables()
            maps = collect_attention_maps(self.model, variables, images)
            # token attention only (ViT/DeiT, like the reference's ViT
            # module); Swin window attention has a B·nW leading dim
            if not maps or maps[-1].shape[0] != len(images):
                return
            has_cls = str(cfg_get(self.model_config, "name", "")).startswith(
                ("vit", "deit"))
            fig, axes = plt.subplots(2, len(images),
                                     figsize=(2.6 * len(images), 5.2))
            axes = np.atleast_2d(axes)
            for i in range(len(images)):
                img = np.asarray(images[i]).squeeze()
                axes[0, i].imshow(img, cmap="gray")
                axes[0, i].set_title(f"label {int(batch.label[i])}",
                                     fontsize=9)
                hm = cls_attention_heatmap(maps[-1][i:i + 1], has_cls=has_cls)
                axes[1, i].imshow(hm, cmap="inferno")
                for r in (0, 1):
                    axes[r, i].axis("off")
            fig.suptitle(f"attention maps — epoch {epoch}")
            metric_logger.log_image("attention_maps", fig, step=epoch)
        except Exception as e:  # non-attention models, headless failures
            logger.debug("attention-map logging skipped: %s", e)

    def save_state(self, path: str | Path) -> Path:
        """Full training state (params+BN+opt_state+step) for exact resume."""
        from .checkpoint import save_checkpoint

        return save_checkpoint(path, self.state, include_opt_state=True)

    def resume_from(self, path: str | Path) -> None:
        """Restore a full training state saved by save_state; a plain model
        checkpoint (no opt_state) warm-starts params only."""
        from .checkpoint import _checkpointer
        from pathlib import Path as _P

        payload = _checkpointer().restore(_P(path).absolute())
        replacements = dict(
            params=payload["params"],
            batch_stats=payload.get("batch_stats") or None,
            step=jnp.asarray(payload.get("step", 0), dtype=jnp.int32),
        )
        if payload.get("opt_state") is not None:
            # orbax restores raw pytrees; rebuild the typed optax state by
            # flattening onto the freshly-initialised structure
            template = self.state.opt_state
            leaves = jax.tree.leaves(payload["opt_state"])
            treedef = jax.tree.structure(template)
            replacements["opt_state"] = jax.tree.unflatten(treedef, leaves)
        if payload.get("ema_params") is not None:
            replacements["ema_params"] = payload["ema_params"]
        elif self.state.ema_params is not None:
            # older checkpoint without EMA: restart the shadow from the
            # restored params (NOT the fresh init) — the closest exact
            # state. Distinct buffers (jnp.array) so the donating epoch
            # program never sees params/ema aliasing.
            replacements["ema_params"] = jax.tree.map(
                jnp.array, payload["params"])
        self.state = self.state.replace(**replacements)
        self._global_step = int(payload.get("step", 0))

    def test(self, pipeline, checkpoint: Optional[str | Path] = None,
             prefix: str = "test_") -> Dict[str, float]:
        """Evaluate, optionally restoring a checkpoint first (the reference
        always tests the best ckpt — kfold_experiment.py:345)."""
        if checkpoint is not None:
            from .checkpoint import load_checkpoint

            variables, _ = load_checkpoint(checkpoint)
            self.state = self.state.replace(
                params=variables["params"],
                batch_stats=variables.get("batch_stats"))
        # test metrics are never silently truncated by the VAL limit —
        # Lightning semantics keep a separate limit_test_batches knob
        return self.eval_epoch(pipeline, prefix=prefix,
                               limit_fraction=self.cfg.limit_test_batches)
