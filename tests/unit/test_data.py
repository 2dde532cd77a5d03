"""Data layer tests (reference models: tests/unit/test_dataset.py,
test_datamodule.py — split logic, loader fallbacks, JSON contracts)."""
import json

import jax
import numpy as np
import pytest

from thyroid_tpu.data import (
    CARSThyroidDataset, DevicePipeline, create_data_loaders, decode_image,
    generate_corpus_arrays, generate_kfold_splits, generate_splits,
    load_split_file, resolve_split, scan_corpus, generate_quality_report,
)


@pytest.mark.unit
class TestCorpusScan:
    def test_scan_order_and_labels(self, temp_dataset_path):
        paths, labels, pids = scan_corpus(temp_dataset_path)
        assert len(paths) == 16
        # normal (label 0) scanned before cancerous (label 1)
        assert labels[:8].sum() == 0 and labels[8:].sum() == 8
        # deterministic sorted order within a class
        assert [p.name for p in paths[:3]] == ["normal_0.png", "normal_1.png", "normal_2.png"]

    def test_patient_ids(self, temp_dataset_path):
        _, _, pids = scan_corpus(temp_dataset_path)
        assert pids[0] == "normal_0"

    def test_empty_dir(self, tmp_path):
        paths, labels, _ = scan_corpus(tmp_path)
        assert len(paths) == 0


@pytest.mark.unit
class TestSplits:
    def test_rotating_fold_indices_stratified(self):
        """Stratified rotation keeps each chunk at the corpus class ratio
        (reference: scripts/prepare_kfold_data.py:30-73); legacy mode
        reproduces the pre-round-5 permute-and-chunk exactly."""
        from thyroid_tpu.data.corpus import rotating_fold_indices

        labels = np.array([0] * 225 + [1] * 225)
        folds = rotating_fold_indices(labels, 5, seed=42, stratified=True)
        assert len(folds) == 5
        for train, val, test in folds:
            # rotation covers the corpus exactly once per fold
            assert len(np.concatenate([train, val, test])) == 450
            assert len(np.unique(np.concatenate([train, val, test]))) == 450
            # per-class balance within 1 image of 50/50
            for part in (train, val, test):
                c0 = int(np.sum(labels[part] == 0))
                assert abs(c0 - len(part) / 2) <= 1
        # test chunks tile the corpus across folds
        all_test = np.concatenate([f[2] for f in folds])
        assert len(np.unique(all_test)) == 450

        legacy = rotating_fold_indices(labels, 5, seed=7, stratified=False)
        order = np.random.RandomState(7).permutation(450)
        chunks = np.array_split(order, 5)
        np.testing.assert_array_equal(legacy[0][2], chunks[0])
        np.testing.assert_array_equal(legacy[0][1], chunks[1])

    def test_stratified_disjoint(self):
        labels = np.array([0] * 50 + [1] * 50)
        s = generate_splits(labels, 0.15, 0.15, random_seed=42)
        all_idx = np.concatenate([s["train"], s["val"], s["test"]])
        assert len(np.unique(all_idx)) == 100
        # stratification: both classes in every split
        for k in s:
            assert len(np.unique(labels[s[k]])) == 2

    def test_seed_reproducible(self):
        labels = np.array([0] * 30 + [1] * 30)
        a = generate_splits(labels, random_seed=7)
        b = generate_splits(labels, random_seed=7)
        for k in a:
            assert np.array_equal(a[k], b[k])

    def test_kfold_rotation_scheme(self, tmp_path):
        labels = np.array([0] * 35 + [1] * 35)
        files = generate_kfold_splits(labels, 7, tmp_path, random_seed=42)
        assert len(files) == 7
        folds = [load_split_file(f) for f in files]
        # rotation: fold i's test == fold i-1's val
        for i in range(7):
            test_i = set(folds[i]["test"].tolist())
            val_prev = set(folds[(i - 1) % 7]["val"].tolist())
            assert test_i == val_prev
        for f in folds:
            assert len(set(f["train"]) | set(f["val"]) | set(f["test"])) == 70

    def test_reference_split_files_load(self):
        """Our loader must read the reference's shipped fold files verbatim."""
        s = load_split_file("/root/reference/data/splits/split_fold_1.json")
        assert set(s) == {"train", "val", "test"}
        assert len(s["train"]) == 320 and len(s["val"]) == 65 and len(s["test"]) == 65
        assert s["train"][0] == 7

    def test_resolve_split_generates_and_persists(self, tmp_path):
        labels = np.array([0] * 20 + [1] * 20)
        s1 = resolve_split(labels, split_dir=tmp_path)
        assert (tmp_path / "split_info.json").exists()
        s2 = resolve_split(labels, split_dir=tmp_path)
        for k in s1:
            assert np.array_equal(s1[k], s2[k])
        info = json.load(open(tmp_path / "split_info.json"))
        assert info["metadata"]["total_images"] == 40


@pytest.mark.unit
class TestDataset:
    def _cfg(self, path, tmp, **kw):
        base = dict(data_path=str(path), split_dir=str(tmp / "splits"),
                    random_seed=42, val_split_ratio=0.25, test_split_ratio=0.25)
        base.update(kw)
        return base

    def test_decode_uint16_png(self, temp_dataset_path):
        paths, _, _ = scan_corpus(temp_dataset_path)
        img = decode_image(paths[0])
        assert img.dtype == np.uint16 and img.shape == (64, 64)

    def test_split_membership(self, temp_dataset_path, tmp_path):
        cfg = self._cfg(temp_dataset_path, tmp_path)
        tr = CARSThyroidDataset(cfg, split="train")
        te = CARSThyroidDataset(cfg, split="test")
        assert set(tr.indices.tolist()).isdisjoint(te.indices.tolist())
        img, label = tr[0]
        assert img.shape == (64, 64, 1) and label in (0, 1)

    def test_load_images_bulk(self, temp_dataset_path, tmp_path):
        ds = CARSThyroidDataset(self._cfg(temp_dataset_path, tmp_path), split="val")
        arr = ds.load_images()
        assert arr.shape == (len(ds), 64, 64, 1) and arr.dtype == np.uint16

    def test_missing_dir_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            CARSThyroidDataset({"data_path": str(tmp_path / "nope")}, split="train")

    def test_synthetic_generation(self, tmp_path):
        cfg = {"data_path": str(tmp_path / "synth"), "synthetic": True,
               "synthetic_size": 12, "split_dir": str(tmp_path / "splits"),
               "val_split_ratio": 0.25, "test_split_ratio": 0.25, "random_seed": 0}
        ds = CARSThyroidDataset(cfg, split="all")
        assert len(ds) == 12
        assert ds.class_distribution() == {"normal": 6, "cancerous": 6}

    def test_synthetic_param_change_regenerates(self, tmp_path):
        """A config edit (difficulty) must regenerate the on-disk corpus —
        the _meta.json stamp guards against silently reusing a stale one."""
        import json

        cfg = {"data_path": str(tmp_path / "synth"), "synthetic": True,
               "synthetic_size": 8, "synthetic_difficulty": 0.0,
               "split_dir": str(tmp_path / "splits"),
               "val_split_ratio": 0.25, "test_split_ratio": 0.25,
               "random_seed": 0}
        CARSThyroidDataset(cfg, split="all")
        img = tmp_path / "synth" / "normal" / "normal_0000.png"
        before = img.read_bytes()
        # same params: idempotent, no rewrite
        m1 = img.stat().st_mtime_ns
        CARSThyroidDataset(cfg, split="all")
        assert img.stat().st_mtime_ns == m1
        # changed difficulty: corpus wiped and regenerated
        cfg["synthetic_difficulty"] = 0.9
        CARSThyroidDataset(cfg, split="all")
        meta = json.loads((tmp_path / "synth" / "_meta.json").read_text())
        assert meta["difficulty"] == 0.9
        assert img.read_bytes() != before


@pytest.mark.unit
class TestDevicePipeline:
    def test_epoch_shapes_and_padding(self):
        imgs, labels = generate_corpus_arrays(n_images=10, size=64)
        pipe = DevicePipeline(imgs, labels, batch_size=4, img_size=32, train=False)
        batches = list(pipe.epoch(jax.random.PRNGKey(0)))
        assert len(batches) == 3
        assert batches[0].image.shape == (4, 32, 32, 1)
        # last batch: 2 real + 2 padded
        assert float(batches[-1].weight.sum()) == 2.0

    def test_train_epoch_shuffles_and_wraps(self):
        imgs, labels = generate_corpus_arrays(n_images=10, size=64)
        pipe = DevicePipeline(imgs, labels, batch_size=4, img_size=32, train=True,
                              augmentation_level="light")
        b = list(pipe.epoch(jax.random.PRNGKey(0)))
        assert all(x.image.shape == (4, 32, 32, 1) for x in b)
        assert all(float(x.weight.sum()) == 4.0 for x in b)
        b2 = list(pipe.epoch(jax.random.PRNGKey(1)))
        assert not np.allclose(np.asarray(b[0].image), np.asarray(b2[0].image))

    def test_eval_deterministic(self):
        imgs, labels = generate_corpus_arrays(n_images=8, size=64)
        pipe = DevicePipeline(imgs, labels, batch_size=4, img_size=32, train=False)
        a = np.asarray(next(iter(pipe.epoch(jax.random.PRNGKey(0)))).image)
        b = np.asarray(next(iter(pipe.epoch(jax.random.PRNGKey(9)))).image)
        assert np.array_equal(a, b)

    def test_standardization_applied(self):
        imgs, labels = generate_corpus_arrays(n_images=8, size=64)
        pipe = DevicePipeline(imgs, labels, batch_size=8, img_size=32,
                              mean=(0.5,), std=(0.5,), train=False)
        batch = next(iter(pipe.epoch(jax.random.PRNGKey(0))))
        x = np.asarray(batch.image)
        assert x.min() >= -1.001 and x.max() <= 1.001  # [0,1] → [-1,1]

    def test_quality_preprocessing_path(self):
        imgs, labels = generate_corpus_arrays(n_images=8, size=64)
        pipe = DevicePipeline(imgs, labels, batch_size=8, img_size=32,
                              quality_preprocessing=True, train=False)
        batch = next(iter(pipe.epoch(jax.random.PRNGKey(0))))
        assert np.isfinite(np.asarray(batch.image)).all()

    def test_rgb_repeat_branch(self):
        """Pretrained-backbone branch: gray→RGB repeat with per-channel
        (ImageNet) normalisation (reference: vit_transforms.py:381-392)."""
        from thyroid_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD

        imgs, labels = generate_corpus_arrays(n_images=8, size=64)
        pipe = DevicePipeline(imgs, labels, batch_size=8, img_size=32,
                              mean=IMAGENET_MEAN, std=IMAGENET_STD,
                              out_channels=3, train=False)
        x = np.asarray(next(iter(pipe.epoch(jax.random.PRNGKey(0)))).image)
        assert x.shape == (8, 32, 32, 3)
        # undo per-channel standardization → all three channels equal again
        undone = x * np.asarray(IMAGENET_STD) + np.asarray(IMAGENET_MEAN)
        assert np.allclose(undone[..., 0], undone[..., 1], atol=1e-6)
        assert np.allclose(undone[..., 0], undone[..., 2], atol=1e-6)

    def test_vit_aug_params_plumbed(self):
        """vit_aug_params reach vit_augment: disabling everything must make
        the vit pipeline flips-only (deterministic given same key)."""
        imgs, labels = generate_corpus_arrays(n_images=8, size=64)
        common = dict(batch_size=8, img_size=32, train=True,
                      augmentation_level="medium", augment_mode="vit")
        off = DevicePipeline(imgs, labels,
                             vit_aug_params={"use_randaugment": False,
                                             "use_patch_quality": False},
                             **common)
        on = DevicePipeline(imgs, labels,
                            vit_aug_params={"use_randaugment": True,
                                            "use_patch_quality": True},
                            **common)
        a = np.asarray(next(iter(off.epoch(jax.random.PRNGKey(3)))).image)
        b = np.asarray(next(iter(on.epoch(jax.random.PRNGKey(3)))).image)
        assert not np.allclose(a, b)


@pytest.mark.unit
@pytest.mark.integration
class TestEndToEndData:
    def test_create_data_loaders(self, temp_dataset_path, tmp_path):
        cfg = {"data_path": str(temp_dataset_path),
               "split_dir": str(tmp_path / "splits"),
               "batch_size": 4, "img_size": 32, "random_seed": 42,
               "val_split_ratio": 0.25, "test_split_ratio": 0.25,
               "apply_augmentations": True, "augmentation_level": "light",
               "quality_preprocessing": False, "mean": [0.5], "std": [0.5]}
        loaders = create_data_loaders(cfg)
        assert set(loaders) == {"train", "val", "test"}
        batch = next(iter(loaders["train"].epoch(jax.random.PRNGKey(0))))
        assert batch.image.shape == (4, 32, 32, 1)

    def test_create_data_loaders_imagenet_branch(self, temp_dataset_path, tmp_path):
        """model in_channels=3 + single-channel dataset mean → ImageNet
        mean/std and 3-channel batches."""
        from thyroid_tpu.data.pipeline import IMAGENET_MEAN

        cfg = {"data_path": str(temp_dataset_path),
               "split_dir": str(tmp_path / "splits"),
               "batch_size": 4, "img_size": 32, "random_seed": 42,
               "val_split_ratio": 0.25, "test_split_ratio": 0.25,
               "apply_augmentations": False, "mean": [0.5], "std": [0.5]}
        loaders = create_data_loaders(
            cfg, model_config={"name": "resnet18", "in_channels": 3})
        pipe = loaders["train"]
        assert pipe.mean == IMAGENET_MEAN and pipe.out_channels == 3
        batch = next(iter(pipe.epoch(jax.random.PRNGKey(0))))
        assert batch.image.shape == (4, 32, 32, 3)

    def test_quality_report_schema(self, temp_dataset_path, tmp_path):
        cfg = {"data_path": str(temp_dataset_path),
               "split_dir": str(tmp_path / "splits"),
               "val_split_ratio": 0.25, "test_split_ratio": 0.25,
               "random_seed": 42}
        report = generate_quality_report(cfg, tmp_path / "q.json")
        assert "dataset_stats" in report
        m = report["dataset_stats"]["train"]["metrics"]
        assert set(m["quality_issues"]) == {"extreme_dark", "low_contrast",
                                            "potential_artifacts"}
        assert (tmp_path / "q.json").exists()


@pytest.mark.unit
class TestPrepareImagesChunking:
    def test_chunked_equals_unchunked(self):
        import jax.numpy as jnp

        from thyroid_tpu.data.pipeline import prepare_images

        imgs, _ = generate_corpus_arrays(n_images=10, size=64)
        raw = jnp.asarray(imgs.astype(np.float32))
        whole = np.asarray(prepare_images(raw, 32, quality=True, chunk=16))
        chunked = np.asarray(prepare_images(raw, 32, quality=True, chunk=4))
        assert whole.shape == chunked.shape == (10, 32, 32, 1)
        assert np.allclose(whole, chunked, atol=1e-5)


@pytest.mark.unit
class TestK2SplitBalance:
    def test_val_split_has_both_classes(self, tmp_path):
        labels = np.array([0] * 40 + [1] * 40)
        files = generate_kfold_splits(labels, 2, tmp_path, random_seed=42)
        for f in files:
            s = load_split_file(f)
            for part in ("train", "val", "test"):
                classes = set(labels[s[part]].tolist())
                assert classes == {0, 1}, f"{f} {part} single-class"
