"""Experiment orchestration tests — 2-fold/1-epoch end-to-end runs on a tiny
synthetic corpus (the reference's integration tier:
scripts/run_all_models_quick_test.py smoke matrix).
"""
import json

import jax
import numpy as np
import pytest

from thyroid_tpu.config.node import ConfigNode
from thyroid_tpu.experiment import (
    AblationExperiment, ExperimentManager, KFoldExperiment,
)


def _exp_config(tmp_path, model=None, folds=2, **extra):
    cfg = ConfigNode({
        "name": "test_exp",
        "output_dir": str(tmp_path / "out"),
        "model": model or {"name": "resnet18", "architecture": "cnn",
                           "img_size": 32, "in_channels": 1, "num_classes": 2},
        "dataset": {
            "name": "synthetic", "data_path": str(tmp_path / "data"),
            "synthetic": True, "synthetic_size": 24,
            "split_dir": str(tmp_path / "splits"),
            "val_split_ratio": 0.25, "test_split_ratio": 0.25,
            "random_seed": 42, "batch_size": 8, "img_size": 32,
            "mean": [0.5], "std": [0.5], "apply_augmentations": False,
            "augmentation_level": "none", "quality_preprocessing": False,
        },
        "training": {
            "epochs": 1, "batch_size": 8,
            "optimizer_params": {"lr": 1e-3},
            "scheduler_params": None,
            "monitor_metric": "val_acc", "monitor_mode": "max",
            "early_stopping_patience": 5, "save_top_k": 1,
        },
        "trainer": {"max_epochs": 1, "enable_checkpointing": True,
                    "precision": "f32"},
        "kfold": {"num_folds": folds, "split_dir": str(tmp_path / "splits"),
                  "split_file_prefix": "split_fold_", "random_seed": 42},
    })
    cfg.merge(extra)
    return cfg


@pytest.mark.integration
class TestKFoldExperiment:
    def test_two_fold_end_to_end(self, tmp_path):
        exp = KFoldExperiment(_exp_config(tmp_path))
        results = exp.execute()
        assert results["num_successful_folds"] == 2
        assert "avg_test_acc" in results and "std_test_acc" in results
        assert 0.0 <= results["avg_test_acc"] <= 1.0
        # split files were generated with the rotating scheme
        assert (tmp_path / "splits" / "split_fold_1.json").exists()
        assert (tmp_path / "splits" / "split_fold_2.json").exists()
        # summary JSON written
        summary = list((tmp_path / "out" / "resnet18").glob("kfold_summary_*.json"))
        assert len(summary) == 1
        data = json.loads(summary[0].read_text())
        assert data["total_folds"] == 2

    def test_slice_partitioned_run_and_merge(self, tmp_path):
        """Multi-slice scale-out: two slice processes each run their fold
        subset; merging their summaries reproduces a full-sweep aggregate."""
        from thyroid_tpu.parallel import merge_slice_summaries

        summaries = []
        for idx in range(2):
            cfg = _exp_config(tmp_path, folds=3)
            cfg.merge({"kfold": {"num_slices": 2, "slice_index": idx}})
            exp = KFoldExperiment(cfg)
            exp.execute()
            path = (tmp_path / "out" / "resnet18" /
                    f"kfold_summary_test_exp_slice{idx}.json")
            assert path.exists()
            summaries.append(path)
        merged = merge_slice_summaries(summaries)
        assert merged["num_successful_folds"] == 3
        assert [r["fold"] for r in merged["raw_fold_results"]] == [1, 2, 3]
        assert "avg_test_acc" in merged

    def test_failed_fold_recorded_and_sweep_continues(self, tmp_path, monkeypatch):
        exp = KFoldExperiment(_exp_config(tmp_path))
        original = exp.run_fold

        def flaky(fold):
            if fold == 1:
                raise RuntimeError("boom")
            return original(fold)

        monkeypatch.setattr(exp, "run_fold", flaky)
        results = exp.execute()
        assert results["num_successful_folds"] == 1
        errors = [r for r in results["raw_fold_results"] if "error" in r]
        assert errors and errors[0]["fold"] == 1


@pytest.mark.integration
class TestAblationExperiment:
    def test_cartesian_product_and_summary(self, tmp_path):
        cfg = _exp_config(tmp_path)
        cfg["ablation"] = {
            "is_primary_ablation_experiment": True,
            "parameter_space": [
                {"path": "training.optimizer_params.lr", "values": [1e-3, 1e-4]},
            ],
        }
        exp = AblationExperiment(cfg)
        results = exp.execute()
        assert results["num_runs"] == 2
        assert results["num_successful"] == 2
        assert results["best_run"] is not None
        assert (tmp_path / "out" / "test_exp" / "ablation_summary.json").exists()

    def test_combinations(self, tmp_path):
        cfg = _exp_config(tmp_path)
        cfg["ablation"] = {"parameter_space": [
            {"path": "a.b", "values": [1, 2]},
            {"path": "c", "values": ["x", "y", "z"]},
        ]}
        exp = AblationExperiment(cfg)
        combos = exp.combinations()
        assert len(combos) == 6
        assert {"a.b": 1, "c": "x"} in combos


@pytest.mark.integration
class TestManagerDispatch:
    def test_dispatch_kfold(self, tmp_path):
        mgr = ExperimentManager(_exp_config(tmp_path))
        exp = mgr.build_experiment()
        assert isinstance(exp, KFoldExperiment)

    def test_dispatch_ablation(self, tmp_path):
        cfg = _exp_config(tmp_path)
        cfg["ablation"] = {"is_primary_ablation_experiment": True,
                           "parameter_space": [{"path": "x", "values": [1]}]}
        exp = ExperimentManager(cfg).build_experiment()
        assert isinstance(exp, AblationExperiment)

    def test_dispatch_dynamic_class_path(self, tmp_path):
        cfg = _exp_config(tmp_path)
        cfg["experiment_class_path"] = \
            "thyroid_tpu.experiment.kfold_experiment.KFoldExperiment"
        exp = ExperimentManager(cfg).build_experiment()
        assert isinstance(exp, KFoldExperiment)

    def test_experiment_node_overrides(self, tmp_path):
        cfg = _exp_config(tmp_path)
        cfg["experiment"] = {"name": "override_exp",
                             "kfold": {"num_folds": 3}}
        exp = ExperimentManager(cfg).build_experiment()
        assert exp.num_folds == 3


@pytest.mark.integration
class TestDistillationExperiment:
    def test_kfold_with_teacher(self, tmp_path):
        """Teacher ckpt trained first, then 1-fold distillation run
        (reference flow: scripts/run_densenet169_deit_tiny_distillation.py)."""
        # 1. quick teacher training to produce a checkpoint
        teacher_cfg = _exp_config(tmp_path, folds=1)
        exp = KFoldExperiment(teacher_cfg)
        results = exp.execute()
        ckpts = list((tmp_path / "out" / "resnet18").rglob("resnet18-best.ckpt"))
        assert ckpts, results
        # 2. distillation: deit student + frozen teacher
        student_cfg = _exp_config(
            tmp_path,
            model={"name": "deit_tiny", "architecture": "vit", "img_size": 32,
                   "in_channels": 1, "num_classes": 2,
                   "params": {"patch_size": 16, "depth": 2, "drop_path_rate": 0.0}},
            folds=1)
        student_cfg["distillation"] = {
            "enabled": True, "temperature": 4.0, "alpha": 0.5,
            "distillation_type": "soft", "progressive": False,
            "teacher_checkpoint": str(ckpts[0]),
            "teacher_model": {"name": "resnet18", "img_size": 32,
                              "in_channels": 1, "num_classes": 2},
        }
        dexp = KFoldExperiment(student_cfg)
        dresults = dexp.execute()
        assert dresults["num_successful_folds"] == 1
        assert dresults["family"] == "distilled_vit"
        assert dresults["student_model_name"] == "deit_tiny"
        assert isinstance(dresults["student_param_count"], int)


@pytest.mark.unit
class TestExperimentPresets:
    """Every configs/experiment/*.yaml must resolve through the manager
    (reference experiment files: configs/experiment/*.yaml)."""

    def test_all_presets_resolve(self):
        from pathlib import Path

        from thyroid_tpu.config import DEFAULT_CONFIG_DIR, compose
        from thyroid_tpu.experiment import (AblationExperiment,
                                            ExperimentManager)

        presets = sorted(
            p.stem for p in (Path(DEFAULT_CONFIG_DIR) / "experiment").glob("*.yaml"))
        assert len(presets) >= 9
        for preset in presets:
            cfg = compose(overrides=[f"experiment={preset}", "dataset=synthetic"])
            exp = ExperimentManager(cfg).build_experiment()
            if preset.startswith("ablation"):
                assert isinstance(exp, AblationExperiment)
            else:
                name = exp.model_config.get("name")
                assert name, f"{preset} resolved no model"

    def test_distillation_preset_carries_teacher(self):
        from thyroid_tpu.config import compose
        from thyroid_tpu.experiment import ExperimentManager
        from thyroid_tpu.models import cfg_get

        cfg = compose(overrides=["experiment=densenet169_distill_deit_tiny_kfold",
                                 "dataset=synthetic"])
        exp = ExperimentManager(cfg).build_experiment()
        assert exp.distillation_config is not None
        assert cfg_get(exp.distillation_config, "teacher_model_name") == "densenet169"


@pytest.mark.unit
class TestAugmentationGroupWiring:
    def test_augmentation_level_flows_to_dataset(self):
        from thyroid_tpu.config import compose
        from thyroid_tpu.experiment import ExperimentManager

        cfg = compose(overrides=["augmentation=heavy", "dataset=synthetic"])
        exp = ExperimentManager(cfg).build_experiment()
        assert exp.dataset_config["augmentation_level"] == "heavy"
        cfg = compose(overrides=["augmentation=no_aug", "dataset=synthetic"])
        exp = ExperimentManager(cfg).build_experiment()
        assert exp.dataset_config["apply_augmentations"] is False
