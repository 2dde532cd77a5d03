"""K-fold cross-validation experiment.

Rebuilds the reference's KFoldExperiment (reference:
src/experiment/kfold_experiment.py:36-486):
- per fold: resolve split_fold_{n}.json (:102-113), clone dataset config with
  split_file/fold (:118-149), build pipelines + model + engine, fit, test the
  best checkpoint (:341-345)
- failed folds log {"error", "fold"} and the sweep continues (:368-375)
- aggregation: avg_/std_ over numeric metrics of successful folds (:380-422)
- summary: kfold_summary_{name}.json with distillation/teacher metadata and
  student param counts when distilling (:425-475)

TPU-native differences: one Trainer (functional engine) instead of
module-class dispatch by model-name substring; distillation is selected by a
`distillation` config node; pipelines are device-resident per fold.
"""
from __future__ import annotations

import copy
import json
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from ..data.corpus import generate_kfold_splits, scan_corpus
from ..data.dataset import CARSThyroidDataset
from ..data.pipeline import DevicePipeline, create_data_loaders
from ..models import ModelRegistry, cfg_get
from ..models.base import create_and_init, num_parameters
from ..training.checkpoint import create_teacher_from_config
from ..training.engine import Trainer
from ..utils.logging import get_logger
from .base_experiment import BaseExperiment

logger = get_logger(__name__)


class KFoldExperiment(BaseExperiment):
    def __init__(self, config: Any):
        super().__init__(config)
        self.kfold_config = cfg_get(config, "kfold", {}) or {}
        self.fold_results: List[Dict[str, Any]] = []
        self.aggregated_results: Dict[str, Any] = {}
        self.model_config = cfg_get(config, "student_model", None) or \
            cfg_get(config, "model", {})
        self.dataset_config = cfg_get(config, "dataset", {})
        self.trainer_config = cfg_get(config, "trainer", {})
        self.training_config = cfg_get(config, "training_content", None) or \
            cfg_get(config, "training", {})
        self.distillation_config = cfg_get(config, "distillation", None)
        self.num_folds = int(cfg_get(self.kfold_config, "num_folds", 5))
        # multi-slice scale-out: each slice process runs its round-robin fold
        # subset; per-slice summaries merge via parallel.multislice (SURVEY
        # §2.8 — folds are independent, DCN carries no training traffic)
        self.num_slices = int(cfg_get(self.kfold_config, "num_slices", 1))
        self.slice_index = int(cfg_get(self.kfold_config, "slice_index", 0))

    # ------------------------------------------------------------------
    def setup(self) -> None:
        name = cfg_get(self.model_config, "name", "model")
        self.output_dir = Path(cfg_get(self.config, "output_dir", "outputs")) / str(name)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self._ensure_split_files()

    def _split_dir(self) -> str:
        """Fold split files live WITH the corpus: the dataset's split_dir
        wins over the kfold group's generic default (both are data/splits
        for the stock datasets, so this only matters for datasets that
        declare their own split_dir — mixing corpora in one split dir would
        let fold indices from one corpus silently select images of
        another)."""
        ds = cfg_get(self.dataset_config, "split_dir", None)
        if ds:
            return str(ds)
        return str(cfg_get(self.kfold_config, "split_dir", "data/splits"))

    def _ensure_split_files(self) -> None:
        """Generate rotating fold files if absent (the reference assumes
        scripts/prepare_kfold_data.py ran; here it is automatic)."""
        split_dir = Path(self._split_dir())
        prefix = cfg_get(self.kfold_config, "split_file_prefix", "split_fold_")
        missing = [n for n in range(1, self.num_folds + 1)
                   if not (split_dir / f"{prefix}{n}.json").exists()]
        if not missing:
            return
        ds = CARSThyroidDataset(self.dataset_config, split="all")
        generate_kfold_splits(
            ds.all_labels, self.num_folds, split_dir,
            random_seed=int(cfg_get(self.kfold_config, "random_seed", 42)),
            prefix=prefix)
        logger.info("generated %d fold split files in %s", self.num_folds, split_dir)

    # ------------------------------------------------------------------
    def _fold_dataset_config(self, fold: int) -> Dict[str, Any]:
        cfg = copy.deepcopy(self.dataset_config.to_dict()
                            if hasattr(self.dataset_config, "to_dict")
                            else dict(self.dataset_config))
        split_dir = self._split_dir()
        prefix = cfg_get(self.kfold_config, "split_file_prefix", "split_fold_")
        cfg["split_file"] = str(Path(split_dir) / f"{prefix}{fold}.json")
        cfg["use_kfold"] = True
        cfg["fold"] = fold
        # training.batch_size takes precedence over the dataset default
        # (reference: configs/training/base.yaml batch_size feeds the loaders)
        bs = cfg_get(self.training_config, "batch_size", None)
        if bs:
            cfg["batch_size"] = int(bs)
        return cfg

    def _build_pipelines(self, fold: int) -> Dict[str, DevicePipeline]:
        dcfg = self._fold_dataset_config(fold)
        arch = str(cfg_get(self.model_config, "architecture", "cnn"))
        augment_mode = "vit" if arch == "vit" else "standard"
        img_size = int(cfg_get(self.model_config, "img_size", None)
                       or dcfg.get("img_size", 224))
        dcfg["img_size"] = img_size
        return create_data_loaders(dcfg, augment_mode=augment_mode,
                                   model_config=self.model_config)

    def run_fold(self, fold: int) -> Dict[str, Any]:
        t0 = time.time()
        pipelines = self._build_pipelines(fold)
        model = ModelRegistry.create_model(self.model_config)
        teacher_fn = None
        if self.distillation_config and \
                cfg_get(self.distillation_config, "enabled", True):
            teacher_fn = create_teacher_from_config(self.distillation_config)
        fold_dir = self.output_dir / f"fold_{fold}"
        trainer = Trainer(
            model,
            self.model_config,
            self.training_config,
            self.trainer_config,
            steps_per_epoch=pipelines["train"].steps_per_epoch(),
            output_dir=fold_dir,
            teacher_fn=teacher_fn,
            distillation_config=self.distillation_config,
        )
        fit = trainer.fit(pipelines["train"], pipelines["val"],
                          extra_ckpt_metadata={"fold": fold})
        test_metrics = trainer.test(
            pipelines["test"],
            checkpoint=fit.best_checkpoint)  # test best ckpt (reference :345)
        result: Dict[str, Any] = {"fold": fold, **test_metrics}
        # val_* metrics from the BEST epoch — the epoch whose checkpoint the
        # test metrics describe. (The reference logs Lightning's last-epoch
        # callback metrics here, which can describe an overfit epoch the
        # test never sees; aligning val and test to the same model is the
        # deliberate fix.)
        val_metrics = {k: v for k, v in self._best_epoch_row(fit).items()
                       if k.startswith("val_")}
        result.update(val_metrics)
        result["best_val_metric"] = fit.best_metric
        result["epochs_trained"] = fit.stopped_epoch + 1
        result["train_time_s"] = time.time() - t0
        if fit.best_checkpoint is not None:
            result["best_checkpoint"] = str(fit.best_checkpoint)
        return result

    def _best_epoch_row(self, fit) -> Dict[str, Any]:
        """History row of the monitored-best epoch (falls back to the last)."""
        if not fit.history:
            return {}
        monitor = str(cfg_get(self.training_config, "monitor_metric",
                              "val_acc"))
        mode = str(cfg_get(self.training_config, "monitor_mode", "max"))
        rows = [r for r in fit.history if monitor in r]
        if not rows:
            return fit.history[-1]
        pick = max if mode == "max" else min
        return pick(rows, key=lambda r: r[monitor])

    def run_stacked(self, folds) -> None:
        """All folds in ONE jitted program (training/stacked.py): states and
        data gain a fold axis and the scan-epoch step is vmapped over it —
        the TPU-native alternative to the reference's sequential fold loop."""
        t0 = time.time()
        pipes = [self._build_pipelines(f) for f in folds]
        teacher_fn = None
        if self.distillation_config and \
                cfg_get(self.distillation_config, "enabled", True):
            teacher_fn = create_teacher_from_config(self.distillation_config)
        from ..training.stacked import StackedKFoldTrainer

        st = StackedKFoldTrainer(
            self.model_config, self.training_config, self.trainer_config,
            [p["train"] for p in pipes], [p["val"] for p in pipes],
            [p["test"] for p in pipes],
            output_dir=self.output_dir / "stacked",
            teacher_fn=teacher_fn,
            distillation_config=self.distillation_config,
        )
        results = st.fit()
        wall = time.time() - t0
        for f, r in zip(folds, results):
            row = {"fold": f,
                   **{k: v for k, v in r.items() if k != "history"}}
            row["train_time_s"] = wall / max(1, len(folds))
            self.fold_results.append(row)

    def run(self) -> Dict[str, Any]:
        folds = range(1, self.num_folds + 1)
        if self.num_slices > 1:
            from ..parallel.multislice import partition_folds

            folds = partition_folds(self.num_folds, self.num_slices,
                                    self.slice_index)
            logger.info("slice %d/%d runs folds %s", self.slice_index,
                        self.num_slices, list(folds))
        if cfg_get(self.kfold_config, "stacked", False):
            from ..training.stacked import StackedShapeError

            try:
                self.run_stacked(list(folds))
                self.aggregate_results()
                return self.aggregated_results
            except StackedShapeError as e:
                logger.warning("stacked k-fold unavailable (%s); falling "
                               "back to the sequential sweep", e)
        for fold in folds:
            logger.info("===== fold %d/%d =====", fold, self.num_folds)
            try:
                self.fold_results.append(self.run_fold(fold))
            except Exception as e:  # continue the sweep (reference :368-375)
                logger.exception("fold %d failed", fold)
                self.fold_results.append({"error": str(e), "fold": fold})
        self.aggregate_results()
        return self.aggregated_results

    # ------------------------------------------------------------------
    def aggregate_results(self) -> None:
        valid = [r for r in self.fold_results if "error" not in r]
        if not valid:
            self.aggregated_results = {"status": "All folds failed or no metrics",
                                       "raw_fold_results": self.fold_results}
            return
        aggregated: Dict[str, Any] = {}
        # union of keys across folds — a metric present only in later folds
        # (e.g. after a partial fold failure) must not be silently dropped
        # (the reference iterates fold-1 keys only, kfold_experiment.py:380-422)
        keys: list = []
        for r in valid:
            for key in r:
                if key not in keys:
                    keys.append(key)
        for key in keys:
            values = [r[key] for r in valid
                      if isinstance(r.get(key), (int, float))
                      and np.isfinite(r.get(key))]
            if values:
                aggregated[f"avg_{key}"] = float(np.mean(values))
                aggregated[f"std_{key}"] = float(np.std(values))
        aggregated["num_successful_folds"] = len(valid)
        aggregated["total_folds"] = self.num_folds
        aggregated["raw_fold_results"] = self.fold_results
        self.aggregated_results = aggregated

    def log_results(self) -> None:
        name = cfg_get(self.config, "name",
                       cfg_get(self.model_config, "name", "experiment"))
        prefix = cfg_get(self.kfold_config, "experiment_name_prefix", name)
        self.aggregated_results["experiment_name"] = str(name)
        self.aggregated_results["model_name"] = str(prefix)
        if self.distillation_config and \
                cfg_get(self.distillation_config, "enabled", True):
            # gate on `enabled` exactly like run_fold/run_stacked — a
            # disabled distillation node must not label the run distilled
            self.aggregated_results["family"] = "distilled_vit"
            self.aggregated_results["student_model_name"] = \
                str(cfg_get(self.model_config, "name", "unknown_student"))
            self.aggregated_results["teacher_model_name"] = \
                str(cfg_get(self.distillation_config, "teacher_model_name",
                            cfg_get(cfg_get(self.distillation_config,
                                            "teacher_model", {}) or {},
                                    "name", "unknown_teacher")))
            try:
                import jax

                _, variables = create_and_init(self.model_config,
                                               jax.random.PRNGKey(0))
                self.aggregated_results["student_param_count"] = \
                    num_parameters(variables)
            except Exception:
                self.aggregated_results["student_param_count"] = "N/A"
        suffix = f"_slice{self.slice_index}" if self.num_slices > 1 else ""
        if suffix:
            self.aggregated_results["slice_index"] = self.slice_index
            self.aggregated_results["num_slices"] = self.num_slices
        path = self.output_dir / f"kfold_summary_{prefix}{suffix}.json"
        with open(path, "w") as f:
            json.dump(self.aggregated_results, f, indent=4, default=str)
        logger.info("k-fold summary written to %s", path)
