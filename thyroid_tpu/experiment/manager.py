"""Experiment manager + CLI entry point.

Rebuilds the reference's ExperimentManager/@hydra.main entry (reference:
src/experiment/manager.py:21-273): assemble the experiment config from the
composed tree, dispatch to KFold / Ablation / dynamic class path, execute.

CLI (Hydra-compatible override syntax via thyroid_tpu.config.compose):

    python -m thyroid_tpu.experiment.manager model=cnn/resnet18 \
        kfold.num_folds=2 trainer.max_epochs=1 dataset=synthetic
"""
from __future__ import annotations

import importlib
import sys
from typing import Any, Optional, Sequence

from ..config import compose
from ..config.node import ConfigNode
from ..models import cfg_get
from ..utils.logging import get_logger
from .ablation_experiment import AblationExperiment
from .base_experiment import BaseExperiment
from .kfold_experiment import KFoldExperiment

logger = get_logger(__name__)


class ExperimentManager:
    def __init__(self, config: ConfigNode):
        self.config = config

    def build_experiment(self) -> BaseExperiment:
        cfg = self.config
        exp_node = cfg_get(cfg, "experiment", None)
        if exp_node is not None:
            # experiment node overrides/augments the root groups; a
            # `config_group` field inside model/student_model resolves a model
            # YAML first, then the node's other fields override it (the
            # analogue of Hydra's `override /model:` in the reference's
            # experiment files — configs/experiment/*.yaml).
            from ..config.loader import load_model_config

            merged = cfg.copy()
            # EVERY key of the experiment node is merged (Hydra experiment
            # files may override any group — an allowlist silently dropped
            # keys like output_dir/seed/augmentation); the group-merge vs
            # replace distinction below only needs the known group names.
            keys = list(exp_node.keys()) if hasattr(exp_node, "keys") else []
            for key in keys:
                v = cfg_get(exp_node, key, None)
                if v is None:
                    continue
                group = cfg_get(v, "config_group", None) if hasattr(v, "get") else None
                if group is not None:
                    base = load_model_config(str(group))
                    overrides = {k2: v2 for k2, v2 in v.items()
                                 if k2 != "config_group"}
                    base.merge(overrides)
                    v = base
                if key in ("kfold", "training", "trainer", "dataset") and \
                        key in merged and hasattr(merged[key], "merge"):
                    merged[key] = merged[key].copy()
                    merged[key].merge(v)
                else:
                    merged[key] = v
            cfg = merged
        cfg.setdefault("name", cfg_get(cfg, "experiment_name", None)
                       or cfg_get(cfg_get(cfg, "model", {}), "name", "experiment"))

        # the `augmentation` config group selects the ladder level
        # (reference root default: configs/config.yaml augmentation=no_aug)
        aug_level = cfg_get(cfg_get(cfg, "augmentation", {}) or {}, "level", None)
        if aug_level is not None and "dataset" in cfg:
            cfg["dataset"]["augmentation_level"] = aug_level
            cfg["dataset"]["apply_augmentations"] = aug_level != "none"

        class_path = cfg_get(cfg, "experiment_class_path", None)
        if class_path:
            module_name, _, cls_name = str(class_path).rpartition(".")
            cls = getattr(importlib.import_module(module_name), cls_name)
            return cls(cfg)
        ablation = cfg_get(cfg, "ablation", None)
        if ablation is not None and cfg_get(ablation, "is_primary_ablation_experiment",
                                            bool(cfg_get(ablation, "parameter_space", None))):
            return AblationExperiment(cfg)
        return KFoldExperiment(cfg)

    def run(self) -> Any:
        experiment = self.build_experiment()
        logger.info("dispatching %s", type(experiment).__name__)
        return experiment.execute()


def launch_experiment(overrides: Optional[Sequence[str]] = None,
                      config_name: str = "config",
                      config_dir: Optional[str] = None) -> Any:
    cfg = compose(config_name=config_name,
                  overrides=overrides if overrides is not None else sys.argv[1:],
                  config_dir=config_dir)
    return ExperimentManager(cfg).run()


if __name__ == "__main__":
    launch_experiment()
