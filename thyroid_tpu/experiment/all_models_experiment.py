"""All-models full-k-fold sweep.

Rebuilds the reference's AllModelsFullKFoldExperiment (reference:
src/experiment/all_models_full_kfold_experiment.py:16-513): discover model
YAMLs excluding base templates (:39-64), per model force quality-aware
dataset (:100-131), run every fold via the k-fold machinery (:155-208),
aggregate avg/std/max/min accuracy (:232-325), keep only the best-fold
checkpoint (:327-428), write all_models_summary.json (:430-447).

The reference's constructor bug (calling the parent with a signature it
doesn't have, :23-32) is not replicated.
"""
from __future__ import annotations

import copy
import json
import shutil
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from ..config.loader import list_model_configs, load_model_config
from ..models import cfg_get
from ..utils.logging import get_logger
from .base_experiment import BaseExperiment
from .kfold_experiment import KFoldExperiment

logger = get_logger(__name__)


class AllModelsFullKFoldExperiment(BaseExperiment):
    def __init__(self, config: Any, config_dir: Optional[str] = None,
                 model_names: Optional[List[str]] = None):
        super().__init__(config)
        self.config_dir = config_dir
        self.model_names = model_names
        self.model_results: Dict[str, Any] = {}

    def setup(self) -> None:
        self.output_dir = Path(cfg_get(self.config, "output_dir", "outputs")) \
            / "all_models_kfold"
        self.output_dir.mkdir(parents=True, exist_ok=True)
        if self.model_names is None:
            self.model_names = list_model_configs(self.config_dir)
        logger.info("sweeping %d models: %s", len(self.model_names),
                    self.model_names)

    def _model_experiment_config(self, model_option: str) -> Any:
        base = self.config.to_dict() if hasattr(self.config, "to_dict") \
            else copy.deepcopy(dict(self.config))
        from ..config.node import ConfigNode

        cfg = ConfigNode(base)
        cfg["model"] = load_model_config(model_option, self.config_dir).to_dict()
        # force quality preprocessing + per-model output dir (reference :100-131)
        if "dataset" in cfg:
            cfg["dataset"]["quality_preprocessing"] = True
            cfg["dataset"]["img_size"] = cfg["model"].get("img_size", 224)
        cfg["output_dir"] = str(self.output_dir)
        cfg["name"] = cfg["model"].get("name", model_option)
        return cfg

    def run(self) -> Dict[str, Any]:
        for option in self.model_names:
            name = option.split("/")[-1]
            logger.info("===== model %s =====", name)
            try:
                exp = KFoldExperiment(self._model_experiment_config(option))
                results = exp.execute()
                self.model_results[name] = self._aggregate_model(name, results)
                self._prune_checkpoints(exp, results)
            except Exception as e:
                logger.exception("model %s failed", name)
                self.model_results[name] = {"error": str(e)}
        return self.model_results

    @staticmethod
    def _aggregate_model(name: str, results: Dict[str, Any]) -> Dict[str, Any]:
        folds = [r for r in results.get("raw_fold_results", [])
                 if "error" not in r]
        accs = [r["test_acc"] for r in folds
                if isinstance(r.get("test_acc"), (int, float))]
        out = {
            "model": name,
            "num_successful_folds": len(folds),
            "avg_accuracy": float(np.mean(accs)) if accs else None,
            "std_accuracy": float(np.std(accs)) if accs else None,
            "max_accuracy": float(np.max(accs)) if accs else None,
            "min_accuracy": float(np.min(accs)) if accs else None,
            "avg_test_auc": results.get("avg_test_auc"),
            "per_fold": folds,
        }
        if accs:
            out["best_fold"] = int(folds[int(np.argmax(accs))]["fold"])
        return out

    def _prune_checkpoints(self, exp: KFoldExperiment,
                           results: Dict[str, Any]) -> None:
        """Keep only the best fold's best checkpoint; delete fold dirs
        (reference :327-428)."""
        folds = [r for r in results.get("raw_fold_results", [])
                 if "error" not in r and "best_checkpoint" in r]
        if not folds:
            return
        best = max(folds, key=lambda r: r.get("test_acc", -np.inf))
        best_ckpt = Path(best["best_checkpoint"])
        keep_dir = exp.output_dir / "best_checkpoint"
        if best_ckpt.exists():
            if keep_dir.exists():
                shutil.rmtree(keep_dir)
            shutil.copytree(best_ckpt, keep_dir)
        for fold in range(1, exp.num_folds + 1):
            shutil.rmtree(exp.output_dir / f"fold_{fold}", ignore_errors=True)

    def log_results(self) -> None:
        path = self.output_dir / "all_models_summary.json"
        with open(path, "w") as f:
            json.dump(self.model_results, f, indent=4, default=str)
        ranked = sorted(
            [(k, v.get("avg_accuracy")) for k, v in self.model_results.items()
             if isinstance(v, dict) and v.get("avg_accuracy") is not None],
            key=lambda kv: kv[1], reverse=True)
        logger.info("all-models leaderboard: %s", ranked)
