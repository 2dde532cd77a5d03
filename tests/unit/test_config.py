"""Config engine tests — composition, overrides, schema validation."""
import pytest

from thyroid_tpu.config import (
    ConfigNode, compose, list_model_configs, load_model_config,
    DatasetConfig, TrainingConfig, TrainerConfig, KFoldConfig, AblationConfig,
)


class TestConfigNode:
    def test_attribute_and_item_access(self):
        c = ConfigNode({"a": {"b": 1}, "x": [1, {"y": 2}]})
        assert c.a.b == 1
        assert c["a"]["b"] == 1
        assert c.x[1].y == 2

    def test_select_and_update_path(self):
        c = ConfigNode({"a": {"b": 1}})
        assert c.select("a.b") == 1
        assert c.select("a.zz", default=7) == 7
        with pytest.raises(KeyError):
            c.select("a.zz")
        c.update_path("a.c.d", 5)
        assert c.a.c.d == 5

    def test_merge_deep(self):
        c = ConfigNode({"a": {"b": 1, "keep": True}})
        c.merge({"a": {"b": 2}, "new": 3})
        assert c.a.b == 2 and c.a.keep is True and c.new == 3

    def test_roundtrip(self):
        d = {"a": {"b": [1, 2]}, "c": None}
        assert ConfigNode(d).to_dict() == d


class TestCompose:
    def test_default_composition(self):
        cfg = compose()
        assert cfg.model.name == "resnet50"
        assert cfg.model.architecture == "cnn"
        assert cfg.dataset.name == "cars_thyroid"
        assert cfg.trainer.max_epochs == 150
        assert cfg.kfold.num_folds == 5

    def test_group_override(self):
        cfg = compose(overrides=["model=vit/swin_tiny", "kfold.num_folds=2"])
        assert cfg.model.name == "swin_tiny"
        assert cfg.model.params.embed_dim == 96
        assert cfg.kfold.num_folds == 2

    def test_typed_and_add_overrides(self):
        cfg = compose(overrides=[
            "trainer.max_epochs=3",
            "training.optimizer_params.lr=0.001",
            "+custom.flag=true",
        ])
        assert cfg.trainer.max_epochs == 3
        assert cfg.training.optimizer_params.lr == 0.001
        assert cfg.custom.flag is True

    def test_list_model_configs(self):
        models = list_model_configs()
        assert "cnn/resnet18" in models
        assert "vit/swin_tiny" in models
        assert len(models) >= 25

    def test_every_model_config_validates(self):
        from thyroid_tpu.config import BaseModelConfig
        for name in list_model_configs():
            cfg = load_model_config(name)
            parsed = BaseModelConfig(**{k: v for k, v in cfg.to_dict().items()
                                        if k != "config_name"})
            assert parsed.num_classes == 2


class TestSchemas:
    def test_dataset_mean_std_validator(self):
        d = DatasetConfig(data_path="x", channels=1, mean=[0.2, 0.3, 0.4], std=0.5)
        assert d.mean == [0.2] and d.std == [0.5]
        with pytest.raises(ValueError):
            DatasetConfig(data_path="x", channels=3, mean=[0.5], std=[0.5])

    def test_trainer_precision_aliases(self):
        assert TrainerConfig(precision="16-mixed").precision == "bf16"
        assert TrainerConfig(precision="32-true").precision == "f32"
        with pytest.raises(ValueError):
            TrainerConfig(precision="int4")

    def test_training_monitor_mode(self):
        with pytest.raises(ValueError):
            TrainingConfig(monitor_mode="sideways")

    def test_ablation_schema_exists(self):
        # The reference imports AblationConfig but never defines it
        # (src/experiment/config.py) — here it is a real schema.
        a = AblationConfig(parameter_space=[{"path": "training.optimizer_params.lr",
                                             "values": [1e-4, 1e-3]}])
        assert a.parameter_space[0].values == [1e-4, 1e-3]

    def test_kfold_defaults(self):
        k = KFoldConfig()
        assert k.num_folds == 5 and k.split_file_prefix == "split_fold_"
