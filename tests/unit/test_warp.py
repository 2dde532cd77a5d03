"""Gather-free warps (ops/warp.py) vs the exact gather formulations."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from thyroid_tpu.ops.augment import rotate, shear, translate
from thyroid_tpu.ops.image import elastic_deform
from thyroid_tpu.ops.warp import (rotate_shear3, shear_x_fast, shear_y_fast,
                                  shift_axis_bilinear)

RS = np.random.RandomState(11)


def batch(b=3, h=32, w=32, c=1):
    return jnp.asarray(RS.rand(b, h, w, c).astype(np.float32))


def smooth_batch(b=2, h=32, w=32):
    """Smooth content — resampling comparisons on white noise measure the
    filters, not the warp; microscopy images are smooth at pixel scale."""
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    imgs = [np.sin(xx / 4.0 + i) * np.cos(yy / 6.0 - i) * 0.5 + 0.5
            for i in range(b)]
    return jnp.asarray(np.stack(imgs).astype(np.float32)[..., None])


class TestShiftPrimitive:
    def test_integer_shift_matches_roll(self):
        x = batch()
        sh = jnp.full((3, 1, 1), 5.0)
        got = np.asarray(shift_axis_bilinear(x, sh, axis=2, max_shift=8))
        # out[j] = x[j+5]; edge-replicate beyond the right edge
        want = np.concatenate(
            [np.asarray(x)[:, :, 5:, :],
             np.repeat(np.asarray(x)[:, :, -1:, :], 5, axis=2)], axis=2)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_fractional_shift(self):
        x = batch()
        sh = jnp.full((3, 1, 1), 1.5)
        got = np.asarray(shift_axis_bilinear(x, sh, axis=1, max_shift=4))
        xa = np.asarray(x)
        want = 0.5 * np.roll(xa, -1, axis=1) + 0.5 * np.roll(xa, -2, axis=1)
        np.testing.assert_allclose(got[:, :-2], want[:, :-2], atol=1e-6)

    def test_per_pixel_shifts(self):
        x = batch(2, 16, 16)
        sh = jnp.asarray(np.clip(RS.randn(2, 16, 16) * 1.5, -3, 3)
                         .astype(np.float32))
        got = np.asarray(shift_axis_bilinear(x, sh, axis=2, max_shift=4))
        xa = np.asarray(x)[:, :, :, 0]
        sa = np.asarray(sh)
        for b in range(2):
            for i in range(16):
                for j in range(4, 12):
                    s = sa[b, i, j]
                    k = int(np.floor(s))
                    f = s - k
                    want = xa[b, i, j + k] * (1 - f) + xa[b, i, j + k + 1] * f
                    assert abs(got[b, i, j, 0] - want) < 1e-5


class TestTreeDecomposition:
    """The O(log S) bit-select tree must be bit-identical to the linear
    taps path wherever it is eligible (shift constant along the axis)."""

    def test_per_row_shifts_axis2(self):
        x = batch(2, 16, 20)
        sh = jnp.asarray(np.clip(RS.randn(2, 16, 1) * 3.0, -6, 6)
                         .astype(np.float32))
        tree = np.asarray(shift_axis_bilinear(x, sh, axis=2, max_shift=7,
                                              method="tree"))
        taps = np.asarray(shift_axis_bilinear(x, sh, axis=2, max_shift=7,
                                              method="taps"))
        np.testing.assert_array_equal(tree, taps)

    def test_per_col_shifts_axis1(self):
        x = batch(2, 20, 16)
        sh = jnp.asarray(np.clip(RS.randn(2, 1, 16) * 3.0, -6, 6)
                         .astype(np.float32))
        tree = np.asarray(shift_axis_bilinear(x, sh, axis=1, max_shift=7,
                                              method="tree"))
        taps = np.asarray(shift_axis_bilinear(x, sh, axis=1, max_shift=7,
                                              method="taps"))
        np.testing.assert_array_equal(tree, taps)

    def test_clip_boundary_and_fill(self):
        x = batch(2, 12, 12)
        sh = jnp.asarray([[[9.0]], [[-9.0]]], dtype=jnp.float32)  # > max
        tree = np.asarray(shift_axis_bilinear(x, sh, axis=2, max_shift=4,
                                              valid_fill=0.3, method="tree"))
        taps = np.asarray(shift_axis_bilinear(x, sh, axis=2, max_shift=4,
                                              valid_fill=0.3, method="taps"))
        np.testing.assert_array_equal(tree, taps)

    def test_power_of_two_range(self):
        # 2S+1 taps with 2S exactly a power of two exercises the pad math
        x = batch(1, 16, 16)
        sh = jnp.full((1, 16, 1), 3.25)
        tree = np.asarray(shift_axis_bilinear(x, sh, axis=2, max_shift=4,
                                              method="tree"))
        taps = np.asarray(shift_axis_bilinear(x, sh, axis=2, max_shift=4,
                                              method="taps"))
        np.testing.assert_array_equal(tree, taps)

    def test_tree_rejects_per_pixel(self):
        x = batch(1, 8, 8)
        sh = jnp.zeros((1, 8, 8))
        with pytest.raises(ValueError):
            shift_axis_bilinear(x, sh, axis=2, max_shift=2, method="tree")


class TestExactEquivalence:
    """Single-axis shear/translate: the fast path must match the affine
    gather path bit-for-bit (same separable bilinear, clamp and fill)."""

    def test_shear_x(self):
        x = batch()
        s = jnp.asarray([0.2, -0.3, 0.05])
        want = np.asarray(shear(x, s, jnp.zeros(3), fill=0.25))
        got = np.asarray(shear_x_fast(x, s, fill=0.25, max_shift=8))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_shear_y(self):
        x = batch()
        s = jnp.asarray([0.15, -0.25, 0.3])
        want = np.asarray(shear(x, jnp.zeros(3), s, fill=0.0))
        got = np.asarray(shear_y_fast(x, s, fill=0.0, max_shift=8))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_translate_x(self):
        x = batch()
        t = jnp.asarray([3.5, -2.25, 0.0])
        want = np.asarray(translate(x, t, jnp.zeros(3), fill=0.5))
        got = np.asarray(shift_axis_bilinear(
            x, -t.reshape(-1, 1, 1), axis=2, max_shift=6, valid_fill=0.5))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_translate_y(self):
        x = batch()
        t = jnp.asarray([-4.0, 1.75, 2.0])
        want = np.asarray(translate(x, jnp.zeros(3), t, fill=0.0))
        got = np.asarray(shift_axis_bilinear(
            x, -t.reshape(-1, 1, 1), axis=1, max_shift=6, valid_fill=0.0))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestRotateShear3:
    def test_quarter_turns_match_gather(self):
        x = batch(4, 24, 24)
        angles = jnp.asarray([0.0, 90.0, 180.0, 270.0])
        want = np.asarray(rotate(x, angles, method="gather"))
        got = np.asarray(rotate_shear3(x, angles))
        np.testing.assert_allclose(got, want, atol=1e-4)

    @pytest.mark.parametrize("angle", [17.0, -30.0, 44.0, 60.0, -135.0])
    def test_general_angles_close_to_gather(self, angle):
        x = smooth_batch()
        angles = jnp.full((2,), angle)
        want = np.asarray(rotate(x, angles, method="gather"))
        got = np.asarray(rotate_shear3(x, angles))
        # 3 sequential 1-D bilinear resamples filter slightly differently
        # than one 2-D one: sub-grey-level on smooth content
        diff = np.abs(got - want)[:, 6:-6, 6:-6]
        assert diff.mean() < 0.003, (angle, diff.mean())
        assert np.percentile(diff, 99) < 0.02, angle

    def test_fill_region_matches_exactly(self):
        x = batch(1, 32, 32)
        angles = jnp.full((1,), 45.0)
        want = np.asarray(rotate(x, angles, method="gather", fill=0.77))
        got = np.asarray(rotate_shear3(x, angles, fill=0.77))
        # the validity mask is the exact one: identical fill footprint
        np.testing.assert_array_equal(got == 0.77, want == 0.77)


class TestElasticSeparable:
    def test_close_to_map_coordinates(self):
        x = smooth_batch()
        key = jax.random.PRNGKey(5)
        want = np.asarray(elastic_deform(x, key, alpha=30.0, sigma=5.0,
                                         method="gather"))
        got = np.asarray(elastic_deform(x, key, alpha=30.0, sigma=5.0,
                                        method="separable"))
        # same displacement fields (same key stream); only the separable
        # field-evaluation approximation differs — small for smooth fields
        diff = np.abs(got - want)
        assert diff.mean() < 0.01, diff.mean()
        assert np.percentile(diff, 99) < 0.06
