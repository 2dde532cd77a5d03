"""Elastic-deformation oracle vs scipy (VERDICT r2 item #6).

The reference's elastic transform is scipy gaussian_filter over uniform
noise ×alpha, then scipy map_coordinates(order=1)
(reference: src/data/transforms.py:117-128). These tests pin our three
pieces against scipy.ndimage itself:

- gaussian_blur        vs scipy.ndimage.gaussian_filter (mode='nearest',
                       = our edge padding; interior also checked against
                       the reference's default mode='reflect')
- elastic gather path  vs scipy.ndimage.map_coordinates on identical
                       displacement fields (exact bilinear sampling)
- elastic_separable    vs scipy exact sampling (the TPU fast path's
                       documented separable approximation — bounded, not
                       bit-equal; docs/DESIGN.md records ~0.2 grey levels
                       on the uint16 scale for the ladder's fields)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

scipy_ndimage = pytest.importorskip("scipy.ndimage")

from thyroid_tpu.ops.image import elastic_deform, gaussian_blur  # noqa: E402
from thyroid_tpu.ops.warp import elastic_separable  # noqa: E402



@pytest.mark.unit
@pytest.mark.parametrize("sigma", [1.5, 5.0, 10.0])
def test_gaussian_blur_matches_scipy(sigma):
    RS = np.random.RandomState(11)
    x = RS.rand(2, 96, 96, 1).astype(np.float32)
    got = np.asarray(gaussian_blur(jnp.asarray(x), sigma))
    for i in range(x.shape[0]):
        want = scipy_ndimage.gaussian_filter(
            x[i, ..., 0].astype(np.float64), sigma, mode="nearest",
            truncate=4.0)
        assert np.abs(got[i, ..., 0] - want).max() < 1e-4


@pytest.mark.unit
def test_gaussian_blur_interior_matches_reference_mode():
    """The reference leaves gaussian_filter at its default mode='reflect';
    we pad with edge replication. Away from the border (> truncation
    radius) the two are identical — pin that interior equivalence."""
    RS = np.random.RandomState(11)
    sigma = 5.0
    r = int(4.0 * sigma + 0.5)
    x = RS.rand(1, 128, 128, 1).astype(np.float32)
    got = np.asarray(gaussian_blur(jnp.asarray(x), sigma))[0, ..., 0]
    want = scipy_ndimage.gaussian_filter(
        x[0, ..., 0].astype(np.float64), sigma, truncate=4.0)  # reflect
    assert np.abs(got[r:-r, r:-r] - want[r:-r, r:-r]).max() < 1e-4


def _reference_fields(shape, alpha, sigma, rs):
    """Displacement-field construction exactly as the reference builds it
    (transforms.py:121-124: uniform noise → gaussian_filter → ×alpha)."""
    dx = scipy_ndimage.gaussian_filter(
        (rs.rand(*shape) * 2 - 1), sigma, mode="nearest") * alpha
    dy = scipy_ndimage.gaussian_filter(
        (rs.rand(*shape) * 2 - 1), sigma, mode="nearest") * alpha
    return dy.astype(np.float32), dx.astype(np.float32)


def _scipy_warp(img, dy, dx):
    """The reference's sampling step (transforms.py:125-128) with
    mode='nearest' (coordinate clamping, our documented boundary rule)."""
    h, w = img.shape
    xg, yg = np.meshgrid(np.arange(w), np.arange(h))
    coords = np.reshape(yg + dy, (-1, 1)), np.reshape(xg + dx, (-1, 1))
    return scipy_ndimage.map_coordinates(
        img.astype(np.float64), coords, order=1, mode="nearest"
    ).reshape(h, w)


@pytest.mark.unit
@pytest.mark.parametrize("alpha,sigma", [(50.0, 5.0), (15.0, 3.0)])
def test_gather_sampler_matches_scipy_map_coordinates(alpha, sigma):
    """Our gather path and scipy must agree bit-for-bit-ish on identical
    fields — isolates the bilinear sampler from field generation."""
    RS = np.random.RandomState(11)
    h = w = 96
    img = (RS.rand(h, w) * 65535).astype(np.float32)
    dy, dx = _reference_fields((h, w), alpha, sigma, RS)
    want = _scipy_warp(img, dy, dx)

    # drive ops/image.elastic_deform's own sampler on the same fields by
    # reproducing its sampling step (map_coordinates order=1 'nearest')
    got = jax.scipy.ndimage.map_coordinates(
        jnp.asarray(img),
        [jnp.asarray(np.arange(h)[:, None] + dy),
         jnp.asarray(np.arange(w)[None, :] + dx)],
        order=1, mode="nearest")
    assert np.abs(np.asarray(got) - want).max() < 1.0  # f32 coords vs f64: sub-grey-level


@pytest.mark.unit
def test_elastic_deform_gather_end_to_end_vs_scipy():
    """elastic_deform(method='gather') end-to-end: extract ITS OWN fields
    (same PRNG stream) and verify the warp equals scipy's sampling of the
    same fields."""
    RS = np.random.RandomState(11)
    b, h, w = 2, 64, 64
    alpha, sigma = 30.0, 5.0
    x = (RS.rand(b, h, w, 1) * 65535).astype(np.float32)
    key = jax.random.PRNGKey(3)
    got = np.asarray(elastic_deform(
        jnp.asarray(x), key, alpha=alpha, sigma=sigma, method="gather"))

    # regenerate the exact fields elastic_deform drew (image.py:465-469)
    k1, k2 = jax.random.split(key)
    dx = jax.random.uniform(k1, (b, h, w, 1), minval=-1.0, maxval=1.0)
    dy = jax.random.uniform(k2, (b, h, w, 1), minval=-1.0, maxval=1.0)
    dx = np.asarray(gaussian_blur(dx, sigma) * alpha)[..., 0]
    dy = np.asarray(gaussian_blur(dy, sigma) * alpha)[..., 0]
    for i in range(b):
        want = _scipy_warp(x[i, ..., 0], dy[i], dx[i])
        assert np.abs(got[i, ..., 0] - want).max() < 1.0


@pytest.mark.unit
def test_elastic_separable_exact_on_axis_aligned_fields():
    """When dy varies only along y and dx only along x, the separable
    two-pass IS the joint bilinear warp — scipy and the fast path must
    agree to f32 noise even on white-noise content."""
    RS = np.random.RandomState(11)
    h = w = 96
    img = (RS.rand(h, w) * 65535).astype(np.float32)
    dy = np.tile((scipy_ndimage.gaussian_filter(
        RS.rand(h) * 2 - 1, 5, mode="nearest") * 30).astype(np.float32)[:, None],
        (1, w))
    dx = np.tile((scipy_ndimage.gaussian_filter(
        RS.rand(w) * 2 - 1, 5, mode="nearest") * 30).astype(np.float32)[None, :],
        (h, 1))
    want = _scipy_warp(img, dy, dx)
    got = np.asarray(elastic_separable(
        jnp.asarray(img)[None, ..., None],
        jnp.asarray(dy)[None], jnp.asarray(dx)[None], max_disp=32))[0, ..., 0]
    assert np.abs(got - want).max() < 1.0


@pytest.mark.unit
def test_elastic_separable_bounded_vs_scipy():
    """The TPU separable fast path vs scipy exact sampling on the
    reference's joint field construction (medium-ladder α=50, σ=5): the
    x-displacement is evaluated at the pre-shift coordinate (documented
    deviation, ops/image.py elastic_deform docstring), so this is a bounded
    approximation — the output is a valid elastic warp drawn from a nearly
    identical deformation distribution, not a pixel-identical one.
    Measured on σ=4-smoothed content: median |err| ≈ 21 (1.4% of content
    std 1498), frac>one-8-bit-level ≈ 8%, correlation >0.999."""
    RS = np.random.RandomState(11)
    h = w = 96
    alpha, sigma = 50.0, 5.0
    img = (RS.rand(h, w) * 65535).astype(np.float32)
    img = scipy_ndimage.gaussian_filter(img, 4.0).astype(np.float32)
    dy, dx = _reference_fields((h, w), alpha, sigma, RS)
    want = _scipy_warp(img, dy, dx)
    got = np.asarray(elastic_separable(
        jnp.asarray(img)[None, ..., None],
        jnp.asarray(dy)[None], jnp.asarray(dx)[None],
        max_disp=int(np.ceil(max(np.abs(dy).max(), np.abs(dx).max()))) + 1,
    ))[0, ..., 0]
    diff = np.abs(got - want)
    assert float(np.median(diff)) < 0.05 * float(img.std())
    assert float((diff > 257.0).mean()) < 0.15
    cc = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert cc > 0.995, cc
