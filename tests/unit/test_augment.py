"""Augmentation-suite tests (reference models: tests/unit/test_transforms.py,
test_vit_transforms.py — numeric range/shape assertions, probability gates
forced to 0/1, MixUp/CutMix λ and bbox math)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image, ImageOps

from thyroid_tpu.ops import (
    adjust_brightness, adjust_contrast, auto_contrast, compute_patch_quality,
    cutmix, equalize, microscopy_augment, microscopy_normalize, mixup,
    posterize, quality_aware_patch_augment, randaugment, random_hflip,
    random_patch_drop, random_rotation, random_vflip, rotate, solarize,
    train_augment, translate, tta_views, vit_augment,
)

RS = np.random.RandomState(11)
KEY = jax.random.PRNGKey(0)


def batch(b=4, h=64, w=64):
    return jnp.asarray(RS.rand(b, h, w, 1).astype(np.float32))


@pytest.mark.unit
class TestGeometric:
    def test_hflip_p1_p0(self):
        x = batch()
        flipped = random_hflip(x, KEY, p=1.0)
        assert np.allclose(np.asarray(flipped), np.asarray(x)[:, :, ::-1, :])
        assert np.allclose(np.asarray(random_hflip(x, KEY, p=0.0)), np.asarray(x))

    def test_vflip_p1(self):
        x = batch()
        flipped = random_vflip(x, KEY, p=1.0)
        assert np.allclose(np.asarray(flipped), np.asarray(x)[:, ::-1, :, :])

    def test_rotate_360_identity(self):
        x = batch()
        out = rotate(x, jnp.zeros(4))
        assert np.allclose(np.asarray(out), np.asarray(x), atol=1e-5)

    def test_rotate_90_matches_rot90(self):
        x = batch(1, 33, 33)  # odd size → exact centre
        out = np.asarray(rotate(x, jnp.array([90.0])))[0, :, :, 0]
        want = np.asarray(jnp.rot90(x[0, :, :, 0], k=1))
        assert np.abs(out[1:-1, 1:-1] - want[1:-1, 1:-1]).max() < 1e-3

    def test_translate_shifts_content(self):
        x = jnp.zeros((1, 16, 16, 1)).at[0, 8, 8, 0].set(1.0)
        out = np.asarray(translate(x, jnp.array([3.0]), jnp.array([0.0])))
        assert out[0, 8, 11, 0] == pytest.approx(1.0, abs=1e-5)

    def test_random_rotation_bounded_change(self):
        x = batch()
        out = random_rotation(x, KEY, degrees=90.0)
        assert out.shape == x.shape
        assert not np.allclose(np.asarray(out), np.asarray(x))


@pytest.mark.unit
class TestIntensityOps:
    def test_brightness(self):
        x = batch()
        out = adjust_brightness(x, jnp.full((4,), 0.5))
        assert np.allclose(np.asarray(out), np.asarray(x) * 0.5, atol=1e-6)

    def test_contrast_preserves_mean(self):
        x = batch()
        out = adjust_contrast(x, jnp.full((4,), 1.5))
        assert np.allclose(np.asarray(out).mean(axis=(1, 2, 3)),
                           np.asarray(x).mean(axis=(1, 2, 3)), atol=0.02)

    def test_autocontrast_matches_pil(self):
        img8 = (RS.rand(32, 32) * 200 + 20).astype(np.uint8)
        got = np.asarray(auto_contrast(
            jnp.asarray(img8[None, ..., None].astype(np.float32) / 255.0)
        ))[0, :, :, 0] * 255
        want = np.asarray(ImageOps.autocontrast(Image.fromarray(img8)))
        assert np.abs(got - want.astype(np.float32)).max() <= 1.0

    def test_equalize_close_to_pil(self):
        img8 = (RS.rand(32, 32) * 255).astype(np.uint8)
        got = np.asarray(equalize(
            jnp.asarray(img8[None, ..., None].astype(np.float32) / 255.0)
        ))[0, :, :, 0] * 255
        want = np.asarray(ImageOps.equalize(Image.fromarray(img8)))
        assert np.abs(got - want.astype(np.float32)).max() <= 2.0

    def test_equalize_onehot_equals_sort_path(self):
        # TPU streaming formulation vs the host sort/gather formulation —
        # must be numerically identical (and both PIL-golden via the
        # test above)
        x = jnp.asarray(RS.rand(3, 24, 28, 1).astype(np.float32))
        a = np.asarray(equalize(x, method="onehot"))
        b = np.asarray(equalize(x, method="sort"))
        assert np.abs(a - b).max() < 1e-6

    def test_posterize_matches_pil(self):
        img8 = (RS.rand(32, 32) * 255).astype(np.uint8)
        got = np.round(np.asarray(posterize(
            jnp.asarray(img8[None, ..., None].astype(np.float32) / 255.0),
            jnp.array([4]),
        ))[0, :, :, 0] * 255)
        want = np.asarray(ImageOps.posterize(Image.fromarray(img8), 4))
        assert np.array_equal(got, want)

    def test_solarize_matches_pil(self):
        img8 = (RS.rand(32, 32) * 255).astype(np.uint8)
        got = np.round(np.asarray(solarize(
            jnp.asarray(img8[None, ..., None].astype(np.float32) / 255.0),
            jnp.array([0.5019607843137255]),  # 128/255
        ))[0, :, :, 0] * 255)
        want = np.asarray(ImageOps.solarize(Image.fromarray(img8), 128))
        assert np.abs(got - want.astype(np.float32)).max() <= 1.0

    def test_microscopy_normalize_range(self):
        x = jnp.asarray((RS.rand(2, 32, 32, 1) * 65535).astype(np.float32))
        out = np.asarray(microscopy_normalize(x))
        assert out.min() >= 0.0 and out.max() <= 1.0


@pytest.mark.unit
class TestMicroscopyAugment:
    def test_p0_identity(self):
        x = batch()
        out = microscopy_augment(x, KEY, p=0.0)
        assert np.allclose(np.asarray(out), np.asarray(x))

    def test_output_clamped(self):
        x = batch()
        out = np.asarray(microscopy_augment(x, KEY, p=1.0))
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_patch_drop_p0_identity(self):
        x = batch()
        out = random_patch_drop(x, KEY, p=0.0)
        assert np.allclose(np.asarray(out), np.asarray(x))

    def test_patch_drop_changes_pixels(self):
        x = batch(4, 64, 64)
        out = np.asarray(random_patch_drop(x, KEY, patch_size=16, p=1.0))
        assert not np.allclose(out, np.asarray(x))


@pytest.mark.unit
class TestRandAugment:
    def test_shape_and_range(self):
        x = batch()
        out = np.asarray(randaugment(x, KEY, n=2, m=9.0))
        assert out.shape == x.shape
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_different_keys_differ(self):
        x = batch()
        a = np.asarray(randaugment(x, jax.random.PRNGKey(1)))
        b = np.asarray(randaugment(x, jax.random.PRNGKey(2)))
        assert not np.allclose(a, b)

    def test_deterministic_per_key(self):
        x = batch()
        a = np.asarray(randaugment(x, jax.random.PRNGKey(5)))
        b = np.asarray(randaugment(x, jax.random.PRNGKey(5)))
        assert np.array_equal(a, b)


@pytest.mark.unit
class TestPatchQuality:
    def test_quality_map_shape(self):
        q = compute_patch_quality(batch(2, 64, 64), patch_size=16)
        assert q.shape == (2, 4, 4)

    def test_uniform_patch_low_contrast_quality(self):
        flat = jnp.full((1, 32, 32, 1), 0.5)
        q = np.asarray(compute_patch_quality(flat, 16))
        assert np.allclose(q, (0.0 + 1.0 + 0.0) / 3.0, atol=1e-5)

    def test_augment_output_valid(self):
        out = np.asarray(quality_aware_patch_augment(batch(), KEY))
        assert out.min() >= 0.0 and out.max() <= 1.0


@pytest.mark.unit
class TestMixes:
    def test_mixup_lambda_combination(self):
        x = batch()
        y = jnp.array([0, 1, 0, 1])
        mixed, ya, yb, lam = mixup(x, y, KEY, alpha=0.8)
        assert mixed.shape == x.shape
        assert 0.0 <= float(lam) <= 1.0
        assert np.array_equal(np.asarray(ya), np.asarray(y))

    def test_cutmix_box_math(self):
        x = batch()
        y = jnp.array([0, 1, 0, 1])
        mixed, ya, yb, lam = cutmix(x, y, KEY, alpha=1.0)
        # λ must equal 1 − realised box area fraction
        changed = ~np.isclose(np.asarray(mixed), np.asarray(x)).all(axis=(0, 3))
        frac = changed.mean()
        assert float(lam) == pytest.approx(1.0 - frac, abs=0.25)

    def test_mixup_alpha0_identity(self):
        x = batch()
        mixed, *_ , lam = mixup(x, jnp.array([0, 1, 0, 1]), KEY, alpha=0)
        assert float(lam) == 1.0
        assert np.allclose(np.asarray(mixed), np.asarray(x))


@pytest.mark.unit
class TestPipelines:
    @pytest.mark.parametrize("level", ["none", "light", "medium", "heavy"])
    def test_ladder_levels(self, level):
        x = batch()
        out = np.asarray(train_augment(x, KEY, level=level))
        assert out.shape == x.shape
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_vit_pipeline(self):
        out = np.asarray(vit_augment(batch(), KEY))
        assert out.shape == (4, 64, 64, 1)

    def test_tta_five_views(self):
        x = batch()
        views = tta_views(x)
        assert len(views) == 5
        assert np.allclose(np.asarray(views[0]), np.asarray(x))
        for v in views[1:]:
            assert not np.allclose(np.asarray(v), np.asarray(x))


@pytest.mark.unit
class TestBatchedOps:
    """Regression: ops must work on real NHWC batches, not just B=1
    (equalize's step term missed its broadcast axis), and multi-channel
    patch drop must fill with the per-channel patch mean."""

    def test_equalize_batch4_matches_per_image(self):
        from thyroid_tpu.ops.augment import equalize

        rs = np.random.RandomState(7)
        x = jnp.asarray(rs.rand(4, 16, 16, 1).astype(np.float32))
        batched = np.asarray(equalize(x))
        for i in range(4):
            single = np.asarray(equalize(x[i:i + 1]))[0]
            np.testing.assert_allclose(batched[i], single, atol=1e-6)

    def test_patch_drop_rgb_fills_in_range(self):
        from thyroid_tpu.ops.augment import random_patch_drop

        rs = np.random.RandomState(8)
        x = jnp.asarray(rs.rand(2, 32, 32, 3).astype(np.float32))
        out = np.asarray(random_patch_drop(x, jax.random.PRNGKey(0), p=1.0))
        assert out.max() <= 1.0 + 1e-6 and out.min() >= -1e-6
