"""SPMD data-parallel tests on the 8-virtual-CPU-device mesh — the
TPU-specific tier the reference lacks (SURVEY §4 implication).
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from thyroid_tpu.data import DevicePipeline, generate_corpus_arrays
from thyroid_tpu.models import ModelRegistry
from thyroid_tpu.parallel import (
    batch_sharding, create_mesh, fsdp_param_sharding, replicated, shard_batch,
)
from thyroid_tpu.training import Trainer


@pytest.mark.unit
class TestMesh:
    def test_create_default_mesh(self):
        mesh = create_mesh()
        assert mesh.shape == {"data": 8}

    def test_create_2d_mesh(self):
        mesh = create_mesh({"data": 4, "model": 2})
        assert mesh.shape == {"data": 4, "model": 2}
        assert mesh.axis_names == ("data", "model")

    def test_too_many_devices_raises(self):
        with pytest.raises(ValueError, match="needs"):
            create_mesh({"data": 99})

    def test_batch_sharding_places_shards(self):
        mesh = create_mesh({"data": 8})
        x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
        xs = jax.device_put(x, batch_sharding(mesh))
        assert len(xs.sharding.device_set) == 8
        assert np.array_equal(np.asarray(xs), x)

    def test_shard_batch_pytree(self):
        mesh = create_mesh({"data": 4})
        batch = {"image": np.zeros((8, 4, 4, 1), np.float32),
                 "label": np.zeros((8,), np.int32)}
        out = shard_batch(batch, mesh)
        assert len(out["image"].sharding.device_set) == 4

    def test_fsdp_param_sharding_rules(self):
        mesh = create_mesh({"data": 4, "model": 2})
        params = {"w": jnp.zeros((64, 128)), "b": jnp.zeros((128,)),
                  "odd": jnp.zeros((3, 5))}
        shardings = fsdp_param_sharding(mesh, "model", params)
        assert shardings["w"].spec == P("model", None) or \
            shardings["w"].spec == P(None, "model")
        assert shardings["b"].spec == P()       # 1-D replicated
        assert shardings["odd"].spec == P()     # indivisible → replicated


@pytest.mark.integration
class TestDataParallelTraining:
    def _fit(self, mesh, lr=1e-3):
        imgs, labels = generate_corpus_arrays(n_images=32, size=64)
        order = np.random.RandomState(1).permutation(32)
        imgs, labels = imgs[order], labels[order]
        sharding = batch_sharding(mesh) if mesh is not None else None
        tr = DevicePipeline(imgs, labels, batch_size=16, img_size=32,
                            train=True, augmentation_level="none",
                            sharding=sharding)
        va = DevicePipeline(imgs, labels, batch_size=16, img_size=32,
                            train=False, sharding=sharding)
        mcfg = {"name": "resnet18", "img_size": 32, "in_channels": 1,
                "num_classes": 2}
        tcfg = {"epochs": 2, "batch_size": 16,
                "optimizer_params": {"lr": lr},
                "scheduler_params": None, "monitor_metric": "val_acc",
                "monitor_mode": "max", "early_stopping_patience": 50}
        # f32 pinned: this test asserts psum-equivalence of the sharded step;
        # under bf16 the different reduction orders drift training trajectories
        trainer = Trainer(ModelRegistry.create_model(mcfg), mcfg, tcfg,
                          {"max_epochs": 2, "enable_checkpointing": False,
                           "deterministic": True, "precision": "f32"},
                          steps_per_epoch=tr.steps_per_epoch(),
                          output_dir="/tmp/ptest", mesh=mesh)
        res = trainer.fit(tr, va)
        return res, trainer

    def test_sharded_training_runs(self):
        mesh = create_mesh({"data": 8})
        res, trainer = self._fit(mesh)
        assert len(res.history) == 2
        assert np.isfinite(res.history[-1]["train_loss"])
        # state replicated across all devices
        leaf = jax.tree.leaves(trainer.state.params)[0]
        assert len(leaf.sharding.device_set) == 8

    def test_multi_device_matches_single_device(self):
        """Data-parallel sharding must not change WHAT is computed.

        Strict check at lr=0: with no updates the metrics depend only on the
        data each step saw, so any drift means the sharded program read
        different batches — the correctness property. At lr>0 the 8-way
        scan-epoch program legitimately reassociates f32 reductions (and BN
        amplifies that over steps), so only a loose band applies: on the
        32-sample val set 0.1 is ~3 samples."""
        res_multi, _ = self._fit(create_mesh({"data": 8}), lr=0.0)
        res_single, _ = self._fit(None, lr=0.0)
        for k in ("train_loss", "val_acc", "val_loss"):
            assert res_multi.history[-1][k] == pytest.approx(
                res_single.history[-1][k], abs=1e-5), k

        res_multi, _ = self._fit(create_mesh({"data": 8}))
        res_single, _ = self._fit(None)
        assert res_multi.history[-1]["train_loss"] == pytest.approx(
            res_single.history[-1]["train_loss"], abs=5e-2)
        assert res_multi.history[-1]["val_acc"] == pytest.approx(
            res_single.history[-1]["val_acc"], abs=0.1)


@pytest.mark.integration
class TestFSDPTraining:
    """VERDICT round-1 item #10: exercise the FSDP `model` axis with a REAL
    training run (params + adam moments sharded), not just spec shapes."""

    def _fit(self, mesh, model_axis=None):
        imgs, labels = generate_corpus_arrays(n_images=32, size=64)
        sharding = batch_sharding(mesh) if mesh is not None else None
        tr = DevicePipeline(imgs, labels, batch_size=16, img_size=32,
                            train=True, augmentation_level="none",
                            sharding=sharding)
        va = DevicePipeline(imgs, labels, batch_size=16, img_size=32,
                            train=False, sharding=sharding)
        mcfg = {"name": "swin_large", "img_size": 32, "in_channels": 1,
                "num_classes": 2,
                "params": {"patch_size": 4, "embed_dim": 32,
                           "depths": [1, 1], "num_heads": [2, 4],
                           "window_size": 4, "drop_path_rate": 0.0}}
        tcfg = {"epochs": 2, "batch_size": 16,
                "optimizer_params": {"lr": 1e-3}, "scheduler_params": None,
                "monitor_metric": "val_acc", "monitor_mode": "max",
                "early_stopping_patience": 50}
        trainer = Trainer(ModelRegistry.create_model(mcfg), mcfg, tcfg,
                          {"max_epochs": 2, "enable_checkpointing": False,
                           "precision": "f32", "model_axis": model_axis},
                          steps_per_epoch=tr.steps_per_epoch(),
                          output_dir="/tmp/fsdp_test", mesh=mesh)
        return trainer.fit(tr, va), trainer

    def test_fsdp_loss_parity_vs_replicated(self):
        res_fsdp, tr_fsdp = self._fit(create_mesh({"data": 4, "model": 2}),
                                      model_axis="model")
        # at least one big param leaf actually sharded over the model axis
        from jax.sharding import PartitionSpec as P2

        specs = [x.sharding.spec for x in jax.tree.leaves(tr_fsdp.state.params)
                 if hasattr(x, "sharding") and x.ndim >= 2]
        assert any("model" in str(s) for s in specs), specs
        res_repl, _ = self._fit(create_mesh({"data": 4}))
        for k in ("train_loss", "val_loss", "val_acc"):
            assert res_fsdp.history[-1][k] == pytest.approx(
                res_repl.history[-1][k], abs=2e-2), k


@pytest.mark.unit
class TestMultiSlice:
    """SURVEY §2.8 DCN story: folds partition across slices; training
    collectives stay inside a slice ('data'/ICI); cross-slice aggregation is
    a host-side summary merge."""

    def test_partition_folds_round_robin(self):
        from thyroid_tpu.parallel import partition_folds

        parts = [partition_folds(7, 3, i) for i in range(3)]
        assert parts == [[1, 4, 7], [2, 5], [3, 6]]
        # disjoint and complete
        flat = sorted(f for p in parts for f in p)
        assert flat == list(range(1, 8))
        with pytest.raises(ValueError):
            partition_folds(5, 2, 2)

    def test_merge_slice_summaries_matches_single_run(self, tmp_path):
        from thyroid_tpu.parallel import merge_slice_summaries

        folds = [{"fold": f, "test_acc": 0.8 + 0.02 * f,
                  "test_loss": 0.5 - 0.01 * f} for f in range(1, 5)]
        folds.append({"fold": 5, "error": "boom"})
        s0 = {"raw_fold_results": [folds[0], folds[2], folds[4]],
              "total_folds": 3, "experiment_name": "e", "model_name": "m"}
        s1 = {"raw_fold_results": [folds[1], folds[3]], "total_folds": 2}
        p = tmp_path / "s1.json"
        p.write_text(json.dumps(s1))
        merged = merge_slice_summaries([s0, p])
        assert merged["num_successful_folds"] == 4
        assert merged["total_folds"] == 5
        accs = [f["test_acc"] for f in folds if "error" not in f]
        assert merged["avg_test_acc"] == pytest.approx(np.mean(accs))
        assert merged["std_test_acc"] == pytest.approx(np.std(accs))
        assert [r["fold"] for r in merged["raw_fold_results"]] == [1, 2, 3, 4, 5]
        assert merged["model_name"] == "m"

    def test_multislice_mesh_shape(self):
        from thyroid_tpu.parallel import multislice_mesh

        mesh = multislice_mesh(2)
        assert mesh.shape == {"slice": 2, "data": 4}
        with pytest.raises(ValueError):
            multislice_mesh(3)  # 8 % 3 != 0

    def test_stacked_step_matches_per_fold(self):
        """One jitted program trains 2 folds at once, one per slice; each
        fold's numbers must match its independently-run single-fold step."""
        from thyroid_tpu.parallel import (
            multislice_mesh, stack_pytrees, stacked_step, unstack_pytree,
        )

        def step(state, batch):
            def loss_fn(w):
                logits = batch["x"] @ w
                logp = jax.nn.log_softmax(logits)
                nll = -jnp.take_along_axis(
                    logp, batch["y"][:, None], axis=1).mean()
                return nll

            loss, g = jax.value_and_grad(loss_fn)(state["w"])
            return {"w": state["w"] - 0.1 * g}, {"loss": loss}

        rng = np.random.RandomState(0)
        folds = []
        for _ in range(2):
            folds.append((
                {"w": rng.randn(16, 2).astype(np.float32)},
                {"x": rng.randn(8, 16).astype(np.float32),
                 "y": rng.randint(0, 2, size=(8,)).astype(np.int32)},
            ))
        # reference: each fold stepped alone
        want = [jax.jit(step)(s, b) for s, b in folds]

        mesh = multislice_mesh(2)
        fn = stacked_step(step, mesh, donate=False)
        st = stack_pytrees([f[0] for f in folds])
        bt = stack_pytrees([f[1] for f in folds])
        new_state, metrics = fn(st, bt)
        got_states = unstack_pytree(new_state, 2)
        got_metrics = unstack_pytree(metrics, 2)
        for i in range(2):
            np.testing.assert_allclose(got_states[i]["w"], want[i][0]["w"],
                                       atol=1e-5)
            np.testing.assert_allclose(got_metrics[i]["loss"],
                                       want[i][1]["loss"], atol=1e-5)
        # fold state is pinned to its slice row, not replicated everywhere
        assert len(new_state["w"].sharding.device_set) == 8
        spec = new_state["w"].sharding.spec
        assert "slice" in str(spec)


@pytest.mark.integration
class TestGraftEntry:
    def test_entry_compiles(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "graft_entry", "/root/repo/__graft_entry__.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        fn, args = mod.entry()
        out = jax.jit(fn)(*args)
        out = jax.tree.leaves(out)[0]
        assert np.isfinite(np.asarray(out)).all()

    def test_dryrun_multichip(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "graft_entry", "/root/repo/__graft_entry__.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(8)

    def test_dryrun_multichip_self_provisions(self, monkeypatch):
        """Driver-env contract: with too few visible devices (single-chip
        platform), dryrun_multichip must re-exec itself into a child with a
        virtual CPU mesh and still pass (VERDICT round-1 item #1)."""
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "graft_entry", "/root/repo/__graft_entry__.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        monkeypatch.setattr(jax, "devices", lambda: jax.local_devices()[:1])
        monkeypatch.delenv("_THYROID_DRYRUN_CHILD", raising=False)
        mod.dryrun_multichip(4)  # 1 visible < 4 → subprocess with 4 virtual devices


@pytest.mark.integration
class TestDistillationUnderMesh:
    """VERDICT r2 item #9: distillation (frozen teacher inside the jitted
    step) on the 8-virtual-device mesh, parity with single-device."""

    def _fit(self, mesh, lr=1e-3):
        from thyroid_tpu.models.base import create_and_init
        from thyroid_tpu.training.checkpoint import make_teacher_fn

        imgs, labels = generate_corpus_arrays(n_images=32, size=64)
        sharding = batch_sharding(mesh) if mesh is not None else None
        tr = DevicePipeline(imgs, labels, batch_size=16, img_size=32,
                            train=True, augmentation_level="none",
                            sharding=sharding)
        va = DevicePipeline(imgs, labels, batch_size=16, img_size=32,
                            train=False, sharding=sharding)
        t_cfg = {"name": "resnet18", "img_size": 32, "in_channels": 1,
                 "num_classes": 2}
        t_model, t_vars = create_and_init(t_cfg, jax.random.PRNGKey(7))
        mcfg = {"name": "deit_tiny", "img_size": 32, "in_channels": 1,
                "num_classes": 2, "params": {"patch_size": 16, "depth": 2}}
        tcfg = {"epochs": 1, "batch_size": 16,
                "optimizer_params": {"lr": lr}, "scheduler_params": None,
                "monitor_metric": "val_acc", "monitor_mode": "max",
                "early_stopping_patience": 50}
        trainer = Trainer(
            ModelRegistry.create_model(mcfg), mcfg, tcfg,
            {"max_epochs": 1, "enable_checkpointing": False,
             "deterministic": True, "precision": "f32"},
            steps_per_epoch=tr.steps_per_epoch(),
            output_dir="/tmp/ptest_distill", mesh=mesh,
            teacher_fn=make_teacher_fn(t_model, t_vars),
            distillation_config={"temperature": 4.0, "alpha": 0.5,
                                 "distillation_type": "soft"})
        assert trainer.loss_mode == "distillation"
        return trainer.fit(tr, va)

    def test_sharded_distillation_matches_single_device(self):
        # lr=0: metrics depend only on the data each step saw (incl. the
        # teacher forward) — exact parity required, same as the plain-CE
        # mesh-parity test above
        multi = self._fit(create_mesh({"data": 8}), lr=0.0)
        single = self._fit(None, lr=0.0)
        for k in ("train_loss", "val_acc", "val_loss"):
            assert multi.history[-1][k] == pytest.approx(
                single.history[-1][k], abs=1e-4), k
        assert np.isfinite(multi.history[-1]["train_loss"])

    def test_sharded_distillation_trains(self):
        multi = self._fit(create_mesh({"data": 8}), lr=1e-3)
        assert np.isfinite(multi.history[-1]["train_loss"])


@pytest.mark.integration
class TestStackedKFoldUnderMesh:
    """VERDICT r2 item #9: the stacked-vmap kfold trainer on a >1-device
    (slice × data) mesh, parity with its own single-device run."""

    def _folds(self, n=2):
        folds = []
        for f in range(n):
            imgs, labels = generate_corpus_arrays(n_images=24, size=64,
                                                  seed=100 + f)
            folds.append((
                DevicePipeline(imgs[:16], labels[:16], batch_size=8,
                               img_size=32, train=True,
                               augmentation_level="none"),
                DevicePipeline(imgs[16:], labels[16:], batch_size=8,
                               img_size=32, train=False),
            ))
        return folds

    def _fit(self, mesh):
        from thyroid_tpu.training.stacked import StackedKFoldTrainer

        mcfg = {"name": "resnet18", "img_size": 32, "in_channels": 1,
                "num_classes": 2}
        tcfg = {"epochs": 1, "batch_size": 8,
                "optimizer_params": {"lr": 1e-3}, "scheduler_params": None,
                "monitor_metric": "val_acc", "monitor_mode": "max",
                "early_stopping_patience": 50}
        trainer_cfg = {"max_epochs": 1, "enable_checkpointing": False,
                       "deterministic": True, "precision": "f32"}
        folds = self._folds()
        st = StackedKFoldTrainer(
            mcfg, tcfg, trainer_cfg,
            [f[0] for f in folds], [f[1] for f in folds],
            output_dir="/tmp/stacked_mesh_parity", mesh=mesh)
        return st.fit()

    def test_slice_data_mesh_matches_single_device(self):
        from thyroid_tpu.parallel.multislice import multislice_mesh

        on_mesh = self._fit(multislice_mesh(2, data_per_slice=4))
        plain = self._fit(None)
        assert len(on_mesh) == len(plain) == 2
        for a, b in zip(on_mesh, plain):
            ha, hb = a["history"][-1], b["history"][-1]
            # same program modulo vmap/sharding; f32 reassociation + BN
            # drift bounds as in test_stacked.py
            assert ha["train_loss"] == pytest.approx(hb["train_loss"],
                                                     abs=2e-2)
            assert ha["val_acc"] == pytest.approx(hb["val_acc"], abs=0.15)
