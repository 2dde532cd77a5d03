"""Serving engine: bucketing, padding correctness, request aggregation."""
import threading

import numpy as np
import pytest

from thyroid_tpu.serving import BatchAggregator, InferenceEngine

MCFG = {"name": "resnet18", "img_size": 32, "in_channels": 1,
        "num_classes": 2}


@pytest.fixture(scope="module")
def engine():
    return InferenceEngine(model_config=MCFG, buckets=(1, 4, 8),
                           raw_inputs=False)


@pytest.mark.unit
class TestInferenceEngine:
    def test_bucket_selection(self, engine):
        assert engine.bucket_for(1) == 1
        assert engine.bucket_for(2) == 4
        assert engine.bucket_for(5) == 8
        assert engine.bucket_for(8) == 8
        assert engine.bucket_for(50) == 8  # chunked at predict level

    def test_padding_does_not_change_results(self, engine):
        rs = np.random.RandomState(0)
        imgs = rs.rand(3, 32, 32, 1).astype(np.float32)
        # 3 → bucket 4 (padded); compare against an exact-bucket call
        probs3 = engine.predict(imgs)
        probs4 = engine.predict(np.concatenate([imgs, imgs[:1]], axis=0))
        np.testing.assert_allclose(probs3, probs4[:3], atol=1e-6)
        assert probs3.shape == (3, 2)
        np.testing.assert_allclose(probs3.sum(axis=-1), 1.0, atol=1e-5)

    def test_large_request_chunks(self, engine):
        rs = np.random.RandomState(1)
        imgs = rs.rand(19, 32, 32, 1).astype(np.float32)   # 2×8 + 3→4
        probs = engine.predict(imgs)
        assert probs.shape == (19, 2)
        # chunking must agree with one-by-one prediction
        one = np.concatenate([engine.predict(imgs[i:i + 1])
                              for i in range(3)])
        np.testing.assert_allclose(probs[:3], one, atol=1e-6)

    def test_raw_input_preprocess_path(self):
        eng = InferenceEngine(model_config=MCFG, buckets=(2,),
                              raw_inputs=True)
        raw = (np.random.RandomState(2).rand(2, 64, 64, 1) * 65535) \
            .astype(np.float32)
        probs = eng.predict(raw)
        assert probs.shape == (2, 2)
        assert np.isfinite(probs).all()

    def test_checkpoint_requires_config_or_metadata(self):
        with pytest.raises(ValueError):
            InferenceEngine()

    def test_three_channel_model_gets_rgb_and_imagenet_stats(self):
        """Serving must reproduce the training-time gray→RGB + ImageNet
        normalization branch for 3-channel (pretrained-style) models."""
        from thyroid_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD

        eng = InferenceEngine(
            model_config={"name": "resnet18", "img_size": 32,
                          "in_channels": 3, "num_classes": 2},
            buckets=(2,), raw_inputs=False)
        assert eng.mean == tuple(IMAGENET_MEAN)
        assert eng.std == tuple(IMAGENET_STD)
        gray = np.random.RandomState(5).rand(2, 32, 32, 1) \
            .astype(np.float32)
        probs = eng.predict(gray)           # 1-channel input, 3-channel net
        assert probs.shape == (2, 2)
        assert np.isfinite(probs).all()


@pytest.mark.unit
class TestBatchAggregator:
    def test_coalesces_concurrent_requests(self, engine):
        agg = BatchAggregator(engine, max_batch=8, max_delay_ms=50.0)
        rs = np.random.RandomState(3)
        imgs = [rs.rand(32, 32, 1).astype(np.float32) for _ in range(8)]
        results = [None] * 8

        def worker(i):
            results[i] = agg.submit(imgs[i])

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        agg.close()
        direct = engine.predict(np.stack(imgs))
        for i in range(8):
            np.testing.assert_allclose(results[i], direct[i], atol=1e-6)
        # 8 concurrent submits against max_batch=8 must not take 8 batches
        assert agg.batches_dispatched <= 4
        assert agg.requests_served == 8

    def test_bad_request_does_not_kill_the_worker(self, engine):
        """A failing batch must surface to ITS callers and leave the
        aggregator alive for subsequent requests."""
        agg = BatchAggregator(engine, max_batch=8, max_delay_ms=5.0)
        good = np.random.RandomState(6).rand(32, 32, 1).astype(np.float32)
        with pytest.raises(ValueError):
            agg.submit(np.zeros((2, 32, 32, 1), np.float32))  # not one image
        agg.submit(good)                      # sets the aggregator shape
        with pytest.raises(ValueError):
            agg.submit(np.zeros((16, 16, 1), np.float32))     # mismatch
        probs = agg.submit(good)              # still alive
        agg.close()
        assert probs.shape == (2,)

    def test_delay_dispatch_single_request(self, engine):
        agg = BatchAggregator(engine, max_batch=8, max_delay_ms=5.0)
        img = np.random.RandomState(4).rand(32, 32, 1).astype(np.float32)
        probs = agg.submit(img)          # dispatches alone after ~5 ms
        agg.close()
        assert probs.shape == (2,)
        np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-5)


@pytest.mark.unit
class TestExportedServing:
    """AOT StableHLO export bundle (serving/export.py)."""

    def test_export_roundtrip_matches_engine(self, engine, tmp_path):
        from thyroid_tpu.serving import export_engine, load_exported

        out = str(tmp_path / "bundle")
        manifest = export_engine(engine, out, buckets=(1, 4))
        assert manifest["buckets"] == [1, 4]
        assert (tmp_path / "bundle" / "bucket_4.stablehlo").exists()
        assert (tmp_path / "bundle" / "params.npz").exists()

        loaded = load_exported(out)
        x = np.random.RandomState(0).rand(3, 32, 32, 1).astype(np.float32)
        got = loaded.predict(x)           # pads 3→4, slices back
        want = engine.predict(x)
        assert got.shape == (3, 2)
        # identical traced program → numerically identical results
        assert np.allclose(got, want, atol=1e-6)

    def test_exported_predict_chunks_large_requests(self, engine, tmp_path):
        from thyroid_tpu.serving import export_engine, load_exported

        out = str(tmp_path / "bundle")
        export_engine(engine, out, buckets=(1, 4))
        loaded = load_exported(out)
        x = np.random.RandomState(1).rand(9, 32, 32, 1).astype(np.float32)
        got = loaded.predict(x)           # 9 > top bucket 4 → chunked
        assert got.shape == (9, 2)
        assert np.allclose(got, engine.predict(x), atol=1e-6)

    def test_export_rejects_mesh_engines(self, engine, tmp_path):
        from thyroid_tpu.serving import export_engine

        engine_like = type("E", (), {"mesh": object()})()
        with pytest.raises(ValueError):
            export_engine(engine_like, str(tmp_path / "b"))

    def test_load_rejects_non_bundle(self, tmp_path):
        from thyroid_tpu.serving import load_exported

        (tmp_path / "manifest.json").write_text("{}")
        with pytest.raises(ValueError):
            load_exported(str(tmp_path))


@pytest.mark.unit
class TestShardedServing:
    """Multi-chip serving: batch sharded over the mesh's data axis,
    params replicated — same numbers as the single-device engine."""

    def test_mesh_matches_single_device(self):
        import jax
        from thyroid_tpu.parallel.mesh import create_mesh

        if jax.device_count() < 8:
            pytest.skip("needs the 8-virtual-device CPU mesh")
        mesh = create_mesh({"data": 8})
        single = InferenceEngine(model_config=MCFG, buckets=(8,),
                                 raw_inputs=False)
        sharded = InferenceEngine(model_config=MCFG, buckets=(3, 8),
                                  raw_inputs=False, mesh=mesh,
                                  variables=single.variables)
        # bucket 3 rounded up to a multiple of the axis size
        assert sharded.buckets == (8,)
        rs = np.random.RandomState(2)
        imgs = rs.rand(6, 32, 32, 1).astype(np.float32)
        np.testing.assert_allclose(sharded.predict(imgs),
                                   single.predict(imgs), atol=2e-5)

    def test_mesh_bucket_rounding_keeps_ladder(self):
        import jax
        from thyroid_tpu.parallel.mesh import create_mesh

        if jax.device_count() < 8:
            pytest.skip("needs the 8-virtual-device CPU mesh")
        mesh = create_mesh({"data": 8})
        eng = InferenceEngine(model_config=MCFG, buckets=(1, 4, 8, 20),
                              raw_inputs=False, mesh=mesh)
        assert eng.buckets == (8, 24)
