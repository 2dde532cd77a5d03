"""Test fixtures. Tests run on CPU with 8 virtual devices so ICI data
parallelism is exercised without TPU hardware (SURVEY.md §4)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# A sitecustomize hook may force-register a TPU plugin and prepend it to
# jax_platforms; pin back to CPU so tests never touch (or contend for) the TPU.
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def synthetic_batch_256_1chan():
    """(4, 256, 256, 1) float32 batch in [0,1] — NHWC (TPU-native layout).
    Mirrors reference tests/conftest.py synthetic_batch_256_1chan (NCHW there)."""
    rs = np.random.RandomState(0)
    return rs.rand(4, 256, 256, 1).astype(np.float32)


@pytest.fixture
def synthetic_batch_224_1chan():
    rs = np.random.RandomState(1)
    return rs.rand(4, 224, 224, 1).astype(np.float32)


@pytest.fixture
def synthetic_labels():
    return np.array([0, 1, 0, 1], dtype=np.int32)


@pytest.fixture
def temp_dataset_path(tmp_path):
    """Directory skeleton with a tiny synthetic corpus (PNG uint16)."""
    import cv2

    rs = np.random.RandomState(42)
    for cls in ("normal", "cancerous"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(8):
            img = (rs.rand(64, 64) * 65535).astype(np.uint16)
            cv2.imwrite(str(d / f"{cls}_{i}.png"), img)
    return tmp_path
