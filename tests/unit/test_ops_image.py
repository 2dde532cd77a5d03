"""Golden-value tests: on-device ops vs cv2/numpy reference semantics.

Mirrors the reference's numeric unit-test strategy for transforms
(reference tests: tests/unit/test_quality_preprocessing.py, test_transforms.py)
but asserts against the *actual* cv2/numpy ops the reference delegates to.
"""
import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thyroid_tpu.ops import (
    adaptive_normalize, anscombe, bilateral_filter, clahe_8bit, clahe_uint16,
    gamma_correct, inverse_anscombe, median_filter_3x3, per_image_quantile,
    quality_issue_masks, quality_preprocess, resize_and_normalize,
    resize_bilinear, suppress_artifacts, to_uint16_scale,
)

RS = np.random.RandomState(7)


def u16_batch(b=2, h=64, w=64):
    return (RS.rand(b, h, w, 1) * 65535).astype(np.float32)


@pytest.mark.unit
class TestScaleOps:
    def test_uint8_upscale(self):
        x = np.array([[0, 255]], dtype=np.uint8).reshape(1, 1, 2, 1)
        out = np.asarray(to_uint16_scale(jnp.asarray(x)))
        assert out[0, 0, 1, 0] == 65535.0  # 255*257, reference dataset.py:527

    def test_gamma_matches_numpy(self):
        x = u16_batch()
        got = np.asarray(gamma_correct(jnp.asarray(x), 0.8))
        want = ((x / 65535.0) ** 0.8 * 65535).astype(np.uint16).astype(np.float32)
        assert np.abs(got - want).max() <= 1.0

    def test_anscombe_roundtrip(self):
        x = jnp.asarray(u16_batch())
        back = inverse_anscombe(anscombe(x))
        assert np.allclose(np.asarray(back), np.asarray(x), rtol=1e-4, atol=0.5)

    def test_adaptive_normalize_percentile(self):
        x = u16_batch()
        got = np.asarray(adaptive_normalize(jnp.asarray(x)))
        for i in range(x.shape[0]):
            lo, hi = np.percentile(x[i], [1, 99])
            want = np.clip(x[i], lo, hi)
            want = (want - lo) / (hi - lo + 1e-8)
            assert np.allclose(got[i], want, atol=5e-3)
        assert got.min() >= 0.0 and got.max() <= 1.0

    def test_adaptive_normalize_minmax(self):
        x = u16_batch()
        got = np.asarray(adaptive_normalize(jnp.asarray(x), method="minmax"))
        assert np.isclose(got.min(), 0.0, atol=1e-5)
        assert np.isclose(got.max(), 1.0, atol=1e-5)

    def test_per_image_quantile(self):
        x = u16_batch(3)
        got = np.asarray(per_image_quantile(jnp.asarray(x), 0.999)).ravel()
        want = np.array([np.quantile(x[i], 0.999) for i in range(3)])
        assert np.allclose(got, want, rtol=1e-3)

    def test_per_image_quantiles_multiway(self):
        from thyroid_tpu.ops.image import per_image_quantiles_multiway

        x = u16_batch(3)
        got = np.asarray(per_image_quantiles_multiway(
            jnp.asarray(x), (0.01, 0.5, 0.99)))
        assert got.shape == (3, 3)
        for i in range(3):
            want = np.quantile(x[i], [0.01, 0.5, 0.99])
            # value-space search: resolution = range/16^6, plus the
            # count-vs-interpolation semantic gap at small N
            assert np.allclose(got[i], want, atol=np.ptp(x[i]) * 2e-3 + 40.0), \
                (got[i], want)

    def test_fused_percentile_normalize_matches_xla_path(self):
        # Pallas kernel (interpret mode on CPU) vs the 2×22-pass XLA
        # bisection: same algorithm run VMEM-resident — bit-exact brackets
        from thyroid_tpu.ops.percentile import fused_percentile_normalize

        for b, h, w, c in [(8, 32, 32, 1), (3, 17, 19, 1), (12, 16, 16, 3),
                           (68, 24, 24, 1)]:
            x = jnp.asarray((RS.rand(b, h, w, c) * 65535).astype(np.float32))
            ref = np.asarray(adaptive_normalize(x, "percentile",
                                                use_kernel=False))
            got = np.asarray(fused_percentile_normalize(x))
            assert np.abs(ref - got).max() < 1e-5, (b, h, w, c)

    def test_multiway_matches_bisection(self):
        from thyroid_tpu.ops.image import (per_image_quantile_fast,
                                           per_image_quantiles_multiway)

        x = u16_batch(4)
        multi = np.asarray(per_image_quantiles_multiway(
            jnp.asarray(x), (0.01, 0.99)))
        lo = np.asarray(per_image_quantile_fast(jnp.asarray(x), 0.01)).ravel()
        hi = np.asarray(per_image_quantile_fast(jnp.asarray(x), 0.99)).ravel()
        rng = np.ptp(x.reshape(4, -1), axis=1)
        # both converge on the same count bracket; tolerance = each method's
        # terminal bracket width
        assert np.allclose(multi[:, 0], lo, atol=rng * 2 ** -20)
        assert np.allclose(multi[:, 1], hi, atol=rng * 2 ** -20)


@pytest.mark.unit
class TestResize:
    def test_matches_cv2_bilinear(self):
        x = u16_batch(1, 64, 64)
        got = np.asarray(resize_bilinear(jnp.asarray(x), 32))[0, :, :, 0]
        want = cv2.resize(x[0, :, :, 0], (32, 32), interpolation=cv2.INTER_LINEAR)
        assert np.abs(got - want).max() / 65535.0 < 0.02

    def test_resize_and_normalize_range(self):
        out = np.asarray(resize_and_normalize(jnp.asarray(u16_batch()), 32))
        assert out.shape == (2, 32, 32, 1)
        assert out.min() >= 0.0 and out.max() <= 1.0


@pytest.mark.unit
class TestSpatialFilters:
    def test_median_matches_cv2(self):
        x = (RS.rand(1, 32, 32, 1) * 255).astype(np.float32)
        got = np.asarray(median_filter_3x3(jnp.asarray(x)))[0, :, :, 0]
        want = cv2.medianBlur(x[0, :, :, 0].astype(np.uint8), 3).astype(np.float32)
        # interior must match exactly; cv2 border handling differs slightly
        assert np.array_equal(np.floor(got[1:-1, 1:-1]), want[1:-1, 1:-1])

    def test_bilateral_close_to_cv2(self):
        img = (RS.rand(32, 32) * 255).astype(np.float32)
        got = np.asarray(bilateral_filter(jnp.asarray(img[None, ..., None])))[0, :, :, 0]
        want = cv2.bilateralFilter(img.astype(np.uint8), 5, 50, 50).astype(np.float32)
        diff = np.abs(got[2:-2, 2:-2] - want[2:-2, 2:-2])
        # cv2 quantises its colour gaussian into a LUT and truncates the
        # spatial window at radius d/2 — measured median offset ≈5.
        assert np.median(diff) <= 8.0
        assert diff.mean() <= 10.0


@pytest.mark.unit
@pytest.mark.quality
class TestCLAHE:
    def test_matches_cv2_8bit(self):
        img = (RS.rand(64, 64) * 255).astype(np.uint8)
        got = np.asarray(clahe_8bit(jnp.asarray(img[None].astype(np.float32)),
                                    clip_limit=2.0, grid=(8, 8)))[0]
        want = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(img)
        diff = np.abs(got - want.astype(np.float32))
        # integer-exact redistribution: only ±0.5 rounding differences remain
        assert diff.max() <= 1.0

    def test_onehot_matches_cv2_8bit(self):
        # TPU streaming formulation (one-hot hist + quadrant LUT apply)
        # against the same cv2 golden — numerics must be identical to the
        # gather path's
        img = (RS.rand(64, 64) * 255).astype(np.uint8)
        got = np.asarray(clahe_8bit(jnp.asarray(img[None].astype(np.float32)),
                                    clip_limit=2.0, grid=(8, 8),
                                    method="onehot"))[0]
        want = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(img)
        assert np.abs(got - want.astype(np.float32)).max() <= 1.0

    def test_onehot_equals_gather_path(self):
        img = (RS.rand(2, 128, 128) * 255).astype(np.float32)
        for grid in [(8, 8), (16, 16), (4, 8)]:
            a = np.asarray(clahe_8bit(jnp.asarray(np.floor(img)),
                                      clip_limit=0.03, grid=grid,
                                      method="onehot"))
            b = np.asarray(clahe_8bit(jnp.asarray(np.floor(img)),
                                      clip_limit=0.03, grid=grid,
                                      method="gather"))
            assert np.abs(a - b).max() < 1e-4, grid

    def test_pallas_equals_gather_path(self):
        # single-compare Pallas quadrant kernel (interpret mode on CPU)
        # against both reference formulations
        img = (RS.rand(2, 128, 128) * 255).astype(np.float32)
        for grid in [(8, 8), (16, 16), (4, 8)]:
            a = np.asarray(clahe_8bit(jnp.asarray(np.floor(img)),
                                      clip_limit=2.0, grid=grid,
                                      method="pallas"))
            b = np.asarray(clahe_8bit(jnp.asarray(np.floor(img)),
                                      clip_limit=2.0, grid=grid,
                                      method="gather"))
            assert np.abs(a - b).max() < 1e-4, grid

    def test_pallas_matches_cv2_8bit(self):
        img = (RS.rand(64, 64) * 255).astype(np.uint8)
        got = np.asarray(clahe_8bit(jnp.asarray(img[None].astype(np.float32)),
                                    clip_limit=2.0, grid=(8, 8),
                                    method="pallas"))[0]
        want = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(img)
        assert np.abs(got - want.astype(np.float32)).max() <= 1.0

    def test_matches_cv2_low_clip(self):
        img = (RS.rand(64, 64) * 40 + 100).astype(np.uint8)  # low contrast
        got = np.asarray(clahe_8bit(jnp.asarray(img[None].astype(np.float32)),
                                    clip_limit=0.03, grid=(16, 16)))[0]
        want = cv2.createCLAHE(clipLimit=0.03, tileGridSize=(16, 16)).apply(img)
        assert np.abs(got - want.astype(np.float32)).mean() < 2.0

    def test_uint16_roundtrip_preserves_range(self):
        x = u16_batch(2)
        out = np.asarray(clahe_uint16(jnp.asarray(x), 2.0, (8, 8)))
        for i in range(2):
            assert out[i].min() >= x[i].min() - 300
            assert out[i].max() <= x[i].max() + 300

    def test_flat_image_identity(self):
        x = jnp.full((1, 32, 32, 1), 1234.0)
        out = np.asarray(clahe_uint16(x, 2.0, (8, 8)))
        assert np.array_equal(out, np.full((1, 32, 32, 1), 1234.0))

    @pytest.mark.parametrize("size,grid,clip", [
        ((64, 64), (4, 4), 3.0),
        ((96, 64), (8, 4), 1.5),
        ((128, 128), (16, 16), 0.5),
        ((80, 112), (5, 7), 2.5),       # odd grid → gather path
        ((256, 256), (32, 32), 0.03),   # reference low-contrast params
        ((256, 256), (16, 16), 2.0),    # reference extreme-dark params
    ])
    def test_matches_cv2_sweep(self, size, grid, clip):
        # property sweep: every (size, grid, clip) must stay within the
        # ±1-grey-level rounding envelope of cv2's clahe.cpp
        rs = np.random.RandomState(hash((size, grid)) % (2**31))
        img = (rs.rand(*size) * 255).astype(np.uint8)
        got = np.asarray(clahe_8bit(jnp.asarray(img[None].astype(np.float32)),
                                    clip_limit=clip, grid=grid))[0]
        want = cv2.createCLAHE(clipLimit=clip, tileGridSize=grid[::-1]).apply(img)
        assert np.abs(got - want.astype(np.float32)).max() <= 1.0

    def test_dual_matches_single_per_image(self):
        # One histogram pass serving both parameterisations must be
        # per-image identical to the two standalone passes (the coarse
        # hists are exact 2×2 sums of the fine hists).
        from thyroid_tpu.ops.clahe import clahe_8bit_dual

        img = np.floor(RS.rand(4, 128, 128) * 256).clip(0, 255).astype(np.float32)
        use_coarse = np.array([True, False, True, False])
        for method in ["gather", "onehot", "pallas"]:
            got = np.asarray(clahe_8bit_dual(
                jnp.asarray(img), jnp.asarray(use_coarse),
                clip_coarse=2.0, grid_coarse=(8, 8),
                clip_fine=0.03, grid_fine=(16, 16), method=method))
            want_c = np.asarray(clahe_8bit(jnp.asarray(img), clip_limit=2.0,
                                           grid=(8, 8), method=method))
            want_f = np.asarray(clahe_8bit(jnp.asarray(img), clip_limit=0.03,
                                           grid=(16, 16), method=method))
            want = np.where(use_coarse[:, None, None], want_c, want_f)
            assert np.abs(got - want).max() < 1e-4, method

    def test_dual_uint16_matches_single(self):
        from thyroid_tpu.ops.clahe import clahe_uint16_dual

        x = u16_batch(4, 64, 64)
        use_coarse = np.array([True, False, False, True])
        got = np.asarray(clahe_uint16_dual(
            jnp.asarray(x), jnp.asarray(use_coarse),
            clip_coarse=2.0, grid_coarse=(16, 16),
            clip_fine=0.03, grid_fine=(32, 32)))
        want_c = np.asarray(clahe_uint16(jnp.asarray(x), 2.0, (16, 16)))
        want_f = np.asarray(clahe_uint16(jnp.asarray(x), 0.03, (32, 32)))
        want = np.where(use_coarse[:, None, None, None], want_c, want_f)
        assert np.array_equal(got, want)

    def test_dual_fused_epilogue_matches_composition(self):
        # In-kernel uint16 round-trip epilogue + branch select must equal
        # the unfused composition (round-trip outside, where() after),
        # including the flat-image (span == 0) pass-through.
        from thyroid_tpu.ops.clahe import (
            clahe_uint16_dual, clahe_uint16_dual_fused)

        x = u16_batch(5, 64, 64)
        x[3] = 1234.0                                     # flat image
        use_coarse = np.array([True, False, False, True, False])
        apply = np.array([True, True, False, True, True])
        got = np.asarray(clahe_uint16_dual_fused(
            jnp.asarray(x), jnp.asarray(use_coarse), jnp.asarray(apply),
            clip_coarse=2.0, grid_coarse=(16, 16),
            clip_fine=0.03, grid_fine=(32, 32), method="pallas"))
        eq = np.asarray(clahe_uint16_dual(
            jnp.asarray(x), jnp.asarray(use_coarse),
            clip_coarse=2.0, grid_coarse=(16, 16),
            clip_fine=0.03, grid_fine=(32, 32), method="pallas"))
        want = np.where(apply[:, None, None, None], eq, x)
        assert np.array_equal(got, want)

    def test_dual_fused_fallback_matches_composition(self):
        from thyroid_tpu.ops.clahe import (
            clahe_uint16_dual, clahe_uint16_dual_fused)

        x = u16_batch(3, 64, 64)
        use_coarse = np.array([True, False, True])
        apply = np.array([True, False, True])
        got = np.asarray(clahe_uint16_dual_fused(
            jnp.asarray(x), jnp.asarray(use_coarse), jnp.asarray(apply),
            clip_coarse=2.0, grid_coarse=(16, 16),
            clip_fine=0.03, grid_fine=(32, 32), method="gather"))
        eq = np.asarray(clahe_uint16_dual(
            jnp.asarray(x), jnp.asarray(use_coarse),
            clip_coarse=2.0, grid_coarse=(16, 16),
            clip_fine=0.03, grid_fine=(32, 32), method="gather"))
        want = np.where(apply[:, None, None, None], eq, x)
        assert np.array_equal(got, want)

    def test_dual_rejects_non_nesting_grids(self):
        from thyroid_tpu.ops.clahe import clahe_8bit_dual

        with pytest.raises(ValueError):
            clahe_8bit_dual(jnp.zeros((1, 64, 64)), jnp.zeros((1,), bool),
                            clip_coarse=2.0, grid_coarse=(8, 8),
                            clip_fine=0.03, grid_fine=(24, 24))


@pytest.mark.unit
@pytest.mark.quality
class TestQualityDetection:
    """Thresholds from reference src/data/quality_preprocessing.py:85-112."""

    def _masks(self, img):
        return jax.tree.map(np.asarray,
                            quality_issue_masks(jnp.asarray(img[None, ..., None])))

    def test_extreme_dark(self):
        img = np.full((64, 64), 100.0, dtype=np.float32)
        m = self._masks(img)
        assert m["extreme_dark"][0] and not m["low_contrast"][0]

    def test_low_contrast(self):
        img = (RS.rand(64, 64) * 60 + 5000).astype(np.float32)  # std≈17<80, mean>150
        m = self._masks(img)
        assert m["low_contrast"][0] and not m["extreme_dark"][0]

    def test_artifacts_ratio(self):
        img = np.full((64, 64), 500.0, dtype=np.float32)
        img[0, 0] = 60000.0  # max/mean > 30
        m = self._masks(img)
        assert m["artifacts"][0]

    def test_clean_image(self):
        img = (RS.rand(64, 64) * 3000 + 4000).astype(np.float32)
        m = self._masks(img)
        assert not any(v[0] for v in m.values())


@pytest.mark.unit
@pytest.mark.quality
class TestQualityPipeline:
    def test_clean_images_pass_through(self):
        x = (RS.rand(2, 64, 64, 1) * 3000 + 4000).astype(np.float32)
        out = np.asarray(quality_preprocess(jnp.asarray(x)))
        assert np.allclose(out, x)

    def test_dark_images_brightened(self):
        x = (RS.rand(2, 64, 64, 1) * 80).astype(np.float32)  # mean < 150
        out = np.asarray(quality_preprocess(jnp.asarray(x)))
        assert out.mean() > x.mean()

    def test_artifact_suppression_reduces_max(self):
        x = (RS.rand(1, 64, 64, 1) * 400 + 300).astype(np.float32)
        x[0, 5, 5, 0] = 65000.0
        out = np.asarray(suppress_artifacts(jnp.asarray(x)))
        assert out.max() < 65000.0

    def test_overcorrection_guard(self):
        # A nearly-black image would be brightened >10×; guard must blend back.
        x = np.full((1, 64, 64, 1), 2.0, dtype=np.float32)
        x[0, :8] = 10.0
        out = np.asarray(quality_preprocess(jnp.asarray(x)))
        assert out.mean() <= x.mean() * 10.0 + 1.0

    def test_fused_median_bilateral_matches_xla(self):
        from thyroid_tpu.ops.image import bilateral_filter, median_filter_3x3
        from thyroid_tpu.ops.stencil import fused_median_bilateral

        x8 = np.floor(RS.rand(2, 64, 64, 1) * 256).clip(0, 255) \
            .astype(np.float32)
        med_k, bil_k = fused_median_bilateral(jnp.asarray(x8))
        med_x = median_filter_3x3(jnp.asarray(x8))
        bil_x = bilateral_filter(med_x)
        # median: identical comparator network → exact
        assert np.array_equal(np.asarray(med_k), np.asarray(med_x))
        # bilateral: same taps/weights, different summation order
        assert np.abs(np.asarray(bil_k) - np.asarray(bil_x)).max() < 1e-2

    def test_fused_stats_quantile_matches_xla(self):
        from thyroid_tpu.ops.image import per_image_quantile_fast, quality_stats
        from thyroid_tpu.ops.percentile import fused_stats_quantile

        x = jnp.asarray(u16_batch(4, 64, 64))
        got = jax.tree.map(np.asarray, fused_stats_quantile(x, q=0.999))
        want = jax.tree.map(np.asarray, quality_stats(x))
        for k in ("mean", "std", "max", "min"):
            assert np.allclose(got[k], want[k], rtol=1e-5), k
        # bisection quantile: identical brackets → bit-identical values
        q = np.asarray(per_image_quantile_fast(x, 0.999)).ravel()
        assert np.array_equal(got["quantile"], q)

    def test_fused_stats_quantile_fallback_odd_size(self):
        from thyroid_tpu.ops.image import per_image_quantile_fast
        from thyroid_tpu.ops.percentile import fused_stats_quantile

        x = jnp.asarray((RS.rand(2, 31, 31, 1) * 65535).astype(np.float32))
        got = fused_stats_quantile(x, q=0.999)  # 961 px: lane fallback
        q = np.asarray(per_image_quantile_fast(x, 0.999)).ravel()
        assert np.array_equal(np.asarray(got["quantile"]), q)

    def test_merged_equals_classic_pipeline(self):
        # merged dual-grid CLAHE path vs the two-pass formulation: the
        # branches are per-image exclusive, so outputs must be identical
        # on a batch that hits every mask class.
        dark = (RS.rand(64, 64, 1) * 80).astype(np.float32)
        lowc = (RS.rand(64, 64, 1) * 60 + 200).astype(np.float32)
        clean = (RS.rand(64, 64, 1) * 3000 + 4000).astype(np.float32)
        art = np.full((64, 64, 1), 500.0, dtype=np.float32)
        art[2, 2, 0] = 64000.0
        x = jnp.asarray(np.stack([dark, lowc, clean, art]))
        a = np.asarray(quality_preprocess(x, merged=True))
        b = np.asarray(quality_preprocess(x, merged=False))
        assert np.array_equal(a, b)

    def test_jit_stability_mixed_batch(self):
        # dark + clean + artifact in one batch, branchless selection
        dark = (RS.rand(64, 64, 1) * 80).astype(np.float32)
        clean = (RS.rand(64, 64, 1) * 3000 + 4000).astype(np.float32)
        art = np.full((64, 64, 1), 500.0, dtype=np.float32)
        art[2, 2, 0] = 64000.0
        x = np.stack([dark, clean, art])
        out = np.asarray(quality_preprocess(jnp.asarray(x)))
        assert np.allclose(out[1], clean)          # clean untouched
        assert out[0].mean() > dark.mean()          # dark brightened
        assert out[2].max() < 64000.0               # artifact clipped
