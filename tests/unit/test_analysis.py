"""Analysis suite tests: GradCAM, attention maps, rollout, confusion/ROC,
charts (reference model: tests/test_attention_quality.py + script behaviors).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thyroid_tpu.analysis import (
    attention_rollout, binary_report, cls_attention_heatmap,
    collect_attention_maps, confusion_roc_figure, gradcam,
    gradient_patch_importance, performance_chart, predict_probs,
    roc_curve_points, swin_stage_feature_maps, visualize_samples,
)
from thyroid_tpu.data import DevicePipeline, generate_corpus_arrays
from thyroid_tpu.models.base import create_and_init

RS = np.random.RandomState(0)


@pytest.fixture(scope="module")
def vit_setup():
    cfg = {"name": "vit_tiny", "img_size": 64, "in_channels": 1,
           "num_classes": 2, "params": {"depth": 3, "drop_path_rate": 0.0}}
    model, variables = create_and_init(cfg, jax.random.PRNGKey(0))
    image = jnp.asarray(RS.rand(1, 64, 64, 1).astype(np.float32))
    return model, variables, image


@pytest.fixture(scope="module")
def cnn_setup():
    cfg = {"name": "resnet18", "img_size": 64, "in_channels": 1,
           "num_classes": 2}
    model, variables = create_and_init(cfg, jax.random.PRNGKey(0))
    image = jnp.asarray(RS.rand(1, 64, 64, 1).astype(np.float32))
    return model, variables, image


@pytest.mark.unit
class TestGradCAM:
    def test_vit_heatmap(self, vit_setup):
        model, variables, image = vit_setup
        hm, cls, conf = gradcam(model, variables, image)
        assert hm.shape == (4, 4)  # 64/16 patches
        assert 0.0 <= hm.min() and hm.max() <= 1.0
        assert cls in (0, 1) and 0.0 <= conf <= 1.0

    def test_cnn_heatmap(self, cnn_setup):
        model, variables, image = cnn_setup
        hm, cls, conf = gradcam(model, variables, image)
        assert hm.ndim == 2 and hm.shape[0] == hm.shape[1]
        assert np.isfinite(hm).all()

    def test_class_idx_override(self, vit_setup):
        model, variables, image = vit_setup
        hm0, cls0, _ = gradcam(model, variables, image, class_idx=0)
        hm1, cls1, _ = gradcam(model, variables, image, class_idx=1)
        assert cls0 == 0 and cls1 == 1
        assert not np.allclose(hm0, hm1)


@pytest.mark.unit
@pytest.mark.attention
class TestAttention:
    def test_collect_maps(self, vit_setup):
        model, variables, image = vit_setup
        maps = collect_attention_maps(model, variables, image)
        assert len(maps) == 3  # depth 3
        n_tokens = 17  # 16 patches + CLS
        assert maps[0].shape == (1, 3, n_tokens, n_tokens)
        # rows sum to 1 (reference: tests/test_attention_quality.py:86)
        assert np.allclose(maps[0].sum(-1), 1.0, atol=1e-4)

    def test_cls_heatmap(self, vit_setup):
        model, variables, image = vit_setup
        maps = collect_attention_maps(model, variables, image)
        hm = cls_attention_heatmap(maps[-1])
        assert hm.shape == (4, 4)
        assert hm.max() <= 1.0

    def test_rollout(self, vit_setup):
        model, variables, image = vit_setup
        maps = collect_attention_maps(model, variables, image)
        hm = attention_rollout(maps)
        assert hm.shape == (4, 4)
        assert np.isfinite(hm).all()

    def test_gradient_patch_importance(self, vit_setup):
        model, variables, image = vit_setup
        imp = gradient_patch_importance(model, variables, image, patch_size=16)
        assert imp.shape == (4, 4)
        assert imp.max() == pytest.approx(1.0)

    def test_swin_stage_maps(self):
        cfg = {"name": "swin_tiny", "img_size": 32, "in_channels": 1,
               "num_classes": 2,
               "params": {"patch_size": 4, "embed_dim": 16,
                          "depths": [1, 1], "num_heads": [2, 2],
                          "window_size": 4, "drop_path_rate": 0.0}}
        model, variables = create_and_init(cfg, jax.random.PRNGKey(0))
        image = jnp.asarray(RS.rand(1, 32, 32, 1).astype(np.float32))
        maps = swin_stage_feature_maps(model, variables, image)
        assert len(maps) == 2
        assert maps[0].shape == (8, 8) and maps[1].shape == (4, 4)


@pytest.mark.unit
class TestEvaluation:
    def test_binary_report_fields(self):
        probs = np.array([[0.2, 0.8], [0.9, 0.1], [0.4, 0.6], [0.7, 0.3]])
        labels = np.array([1, 0, 1, 0])
        rep = binary_report(probs, labels)
        assert rep["accuracy"] == 1.0
        assert rep["sensitivity"] == 1.0 and rep["specificity"] == 1.0
        assert rep["confusion_matrix"] == [[2, 0], [0, 2]]

    def test_roc_points_monotone(self):
        probs1 = RS.rand(100)
        labels = (RS.rand(100) > 0.5).astype(int)
        fpr, tpr = roc_curve_points(probs1, labels)
        assert (np.diff(fpr) >= -1e-9).all()
        assert fpr[0] == 0.0 and fpr[-1] == 1.0

    def test_predict_probs_with_tta(self, cnn_setup):
        model, variables, _ = cnn_setup
        imgs, labels = generate_corpus_arrays(n_images=6, size=64)
        pipe = DevicePipeline(imgs, labels, batch_size=4, img_size=64,
                              train=False)
        probs, lab, w = predict_probs(model, variables, pipe, tta=True)
        assert probs.shape == (6, 2)
        assert np.allclose(probs.sum(-1), 1.0, atol=1e-4)

    def test_confusion_roc_figure(self, tmp_path):
        probs = RS.rand(40, 2)
        probs = probs / probs.sum(-1, keepdims=True)
        labels = (RS.rand(40) > 0.5).astype(int)
        rep = binary_report(probs, labels)
        fpr, tpr = roc_curve_points(probs[:, 1], labels)
        out = tmp_path / "cr.png"
        confusion_roc_figure({"m": rep}, {"m": (fpr, tpr)}, out)
        assert out.exists() and out.stat().st_size > 1000


@pytest.mark.unit
class TestCharts:
    def test_performance_chart(self, tmp_path):
        from thyroid_tpu.analysis import REFERENCE_RESULTS

        results = {"resnet18": {"accuracy": 86.0, "std": 1.0},
                   "swin_tiny": {"accuracy": 94.5, "std": 0.5}}
        out = tmp_path / "perf.png"
        performance_chart(results, out, reference=REFERENCE_RESULTS)
        assert out.exists()

    def test_visualize_samples(self, tmp_path):
        imgs, labels = generate_corpus_arrays(n_images=8, size=64)
        out = tmp_path / "samples.png"
        visualize_samples(imgs, labels, n=8, output_path=out)
        assert out.exists()


@pytest.mark.unit
class TestRound2Viz:
    """Round-2 viz depth (VERDICT items: aug grids, class distribution,
    dataset orchestrator, raw-vs-processed figures, image logging)."""

    def _imgs(self, n=8, size=32):
        rs = np.random.RandomState(0)
        imgs = (rs.rand(n, size, size, 1) * 60000).astype(np.float32)
        labels = np.arange(n) % 2
        return imgs, labels

    def test_augmentation_comparison_grid(self, tmp_path):
        from thyroid_tpu.analysis.charts import create_augmentation_comparison_grid

        imgs, labels = self._imgs()
        p = tmp_path / "grid.png"
        create_augmentation_comparison_grid(imgs / 65535.0, labels,
                                            n_originals=2, n_augmentations=2,
                                            output_path=p)
        assert p.exists() and p.stat().st_size > 1000

    def test_plot_class_distribution(self, tmp_path):
        from thyroid_tpu.analysis.charts import plot_class_distribution

        p = tmp_path / "cls.png"
        plot_class_distribution(np.array([0, 0, 1, 1, 1]), p)
        assert p.exists()

    def test_visualize_dataset_orchestrator(self, temp_dataset_path, tmp_path):
        from pathlib import Path

        from thyroid_tpu.analysis.charts import visualize_dataset

        cfg = {"data_path": str(temp_dataset_path),
               "split_dir": str(tmp_path / "splits"),
               "val_split_ratio": 0.25, "test_split_ratio": 0.25,
               "random_seed": 42}
        written = visualize_dataset(cfg, tmp_path / "figs",
                                    splits=("train", "val"))
        assert len(written["train"]) == 5   # stats/samples/cls/diversity/aug
        assert all(Path(f).exists() for f in written["train"])

    def test_sample_figures(self, tmp_path):
        from thyroid_tpu.analysis.figures import (
            create_feature_comparison, create_intensity_distribution_plot,
            create_preprocessing_comparison, create_sample_grid)

        imgs, labels = self._imgs()
        processed = imgs[::-1]
        for name, call in (
            ("grid", lambda p: create_sample_grid(imgs, processed, labels,
                                                  n_samples=4, output_path=p)),
            ("feat", lambda p: create_feature_comparison(imgs, processed, p)),
            ("inten", lambda p: create_intensity_distribution_plot(
                imgs, processed, labels, p)),
            ("stages", lambda p: create_preprocessing_comparison(imgs[0], p)),
        ):
            p = tmp_path / f"{name}.png"
            call(p)
            assert p.exists() and p.stat().st_size > 1000, name

    def test_metric_logger_log_image(self, tmp_path):
        from thyroid_tpu.utils.observe import MetricLogger

        ml = MetricLogger(tmp_path, use_tensorboard=False)
        ml.log_image("attention", np.random.rand(16, 16), step=3)
        ml.close()
        assert (tmp_path / "images" / "attention_00003.png").exists()

    def test_attention_logging_during_fit(self, tmp_path):
        from thyroid_tpu.data import DevicePipeline, generate_corpus_arrays
        from thyroid_tpu.models import ModelRegistry
        from thyroid_tpu.training import Trainer

        imgs, labels = generate_corpus_arrays(n_images=8, size=64)
        tr = DevicePipeline(imgs, labels, batch_size=8, img_size=32,
                            train=True, augmentation_level="none")
        va = DevicePipeline(imgs, labels, batch_size=8, img_size=32,
                            train=False)
        mcfg = {"name": "vit_tiny", "img_size": 32, "in_channels": 1,
                "num_classes": 2,
                "params": {"embed_dim": 32, "depth": 1, "num_heads": 2,
                           "patch_size": 8, "drop_path_rate": 0.0}}
        tcfg = {"epochs": 1, "batch_size": 8,
                "optimizer_params": {"lr": 1e-3}, "scheduler_params": None,
                "monitor_metric": "val_acc", "monitor_mode": "max",
                "early_stopping_patience": 5}
        t = Trainer(ModelRegistry.create_model(mcfg), mcfg, tcfg,
                    {"max_epochs": 1, "enable_checkpointing": False,
                     "log_attention_every_n_epochs": 1},
                    steps_per_epoch=1, output_dir=str(tmp_path))
        t.fit(tr, va)
        assert list((tmp_path / "logs" / "images").glob("attention_maps_*.png"))
