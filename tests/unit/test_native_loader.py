"""Native C++ decode loader tests — builds the shared lib, compares against
the Python decode chain bit-for-bit."""
import numpy as np
import pytest

from thyroid_tpu.data.dataset import decode_image
from thyroid_tpu.native import build_native, decode_batch_native, load_native


@pytest.mark.unit
class TestNativeLoader:
    def test_builds(self):
        path = build_native()
        if path is None:
            pytest.skip("no native toolchain")
        assert path.exists()

    def test_batch_matches_python_decode(self, temp_dataset_path):
        if load_native() is None:
            pytest.skip("no native toolchain")
        from thyroid_tpu.data.corpus import scan_corpus

        paths, _, _ = scan_corpus(temp_dataset_path)
        native = decode_batch_native(paths)
        assert native is not None
        assert native.dtype == np.uint16
        py = np.stack([decode_image(p) for p in paths])[..., None]
        assert np.array_equal(native, py)

    def test_unsupported_format_falls_back(self, tmp_path):
        f = tmp_path / "x.jpg"
        f.write_bytes(b"\xff\xd8\xff")
        assert decode_batch_native([f]) is None

    def test_dataset_uses_native(self, temp_dataset_path, tmp_path):
        from thyroid_tpu.data import CARSThyroidDataset

        ds = CARSThyroidDataset(
            {"data_path": str(temp_dataset_path),
             "split_dir": str(tmp_path / "s"), "val_split_ratio": 0.25,
             "test_split_ratio": 0.25, "random_seed": 0}, split="all")
        arr = ds.load_images()
        assert arr.shape == (16, 64, 64, 1) and arr.dtype == np.uint16
