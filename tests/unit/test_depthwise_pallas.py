"""Pallas depthwise conv vs lax.conv_general_dilated (ground truth)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thyroid_tpu.ops.depthwise_pallas import depthwise_conv2d_pallas

RS = np.random.RandomState(7)


def xla_depthwise(x, w, p):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(1, 1), padding=[(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1]).astype(x.dtype)


# every stride-1 depthwise shape in efficientnet_b0 at 224² (B scaled down)
B0_SHAPES = [
    (2, 112, 112, 32, 3),
    (2, 56, 56, 144, 3),
    (2, 28, 28, 240, 5),
    (4, 14, 14, 480, 3),
    (4, 14, 14, 480, 5),
    (4, 14, 14, 672, 5),
    (8, 7, 7, 1152, 5),
    (8, 7, 7, 1152, 3),
]


class TestDepthwisePallas:
    @pytest.mark.parametrize("b,h,w,c,k", B0_SHAPES)
    def test_matches_xla_f32(self, b, h, w, c, k):
        x = jnp.asarray(RS.randn(b, h, w, c).astype(np.float32))
        ker = jnp.asarray(RS.randn(k, k, 1, c).astype(np.float32) * 0.2)
        ref = np.asarray(xla_depthwise(x, ker, k // 2))
        got = np.asarray(depthwise_conv2d_pallas(x, ker))
        assert np.abs(ref - got).max() < 1e-4 * max(1.0, np.abs(ref).max())

    def test_matches_xla_bf16(self):
        b, h, w, c, k = 2, 28, 28, 240, 5
        x = jnp.asarray(RS.randn(b, h, w, c).astype(np.float32))
        ker = jnp.asarray(RS.randn(k, k, 1, c).astype(np.float32) * 0.2)
        ref = np.asarray(
            xla_depthwise(x.astype(jnp.bfloat16), ker.astype(jnp.bfloat16),
                          k // 2).astype(jnp.float32))
        got = np.asarray(
            depthwise_conv2d_pallas(
                x.astype(jnp.bfloat16),
                ker.astype(jnp.bfloat16)).astype(jnp.float32))
        # both accumulate f32 over bf16 operands; differ by reduction order
        assert np.abs(ref - got).max() < 0.1 * max(1.0, np.abs(ref).max())

    def test_odd_batch_block_fallback(self):
        # B=3 has no even divisor: runs with one image per block
        x = jnp.asarray(RS.randn(3, 14, 14, 480).astype(np.float32))
        ker = jnp.asarray(RS.randn(3, 3, 1, 480).astype(np.float32) * 0.2)
        ref = np.asarray(xla_depthwise(x, ker, 1))
        got = np.asarray(depthwise_conv2d_pallas(x, ker))
        assert np.abs(ref - got).max() < 1e-4 * max(1.0, np.abs(ref).max())

    def test_efficientnet_param_tree_and_forward_equivalent(self):
        """dw_pallas must not move any param path, and the full-model eval
        forward must match the XLA conv path on shared params."""
        from thyroid_tpu.models.base import create_and_init

        mcfg = {"name": "efficientnet_b0", "img_size": 64}
        model_a, va = create_and_init({**mcfg, "dw_pallas_conv": True},
                                      jax.random.PRNGKey(3))
        model_b, vb = create_and_init({**mcfg, "dw_pallas_conv": False},
                                      jax.random.PRNGKey(3))
        pa = jax.tree_util.tree_flatten_with_path(va)[0]
        pb = jax.tree_util.tree_flatten_with_path(vb)[0]
        assert [(k, v.shape) for k, v in pa] == [(k, v.shape) for k, v in pb]

        x = jnp.asarray(np.random.RandomState(1)
                        .rand(2, 64, 64, 1).astype(np.float32))
        la = model_a.apply(va, x, train=False)
        lb = model_b.apply(va, x, train=False)  # same params, other impl
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=2e-4, rtol=1e-4)

    def test_grads_match_xla(self):
        # custom_vjp backward (XLA ops) vs autodiff through the XLA conv —
        # Grad-CAM style input grads and training-style weight grads
        b, h, w, c, k = 2, 14, 14, 48, 3
        x = jnp.asarray(RS.randn(b, h, w, c).astype(np.float32))
        ker = jnp.asarray(RS.randn(k, k, 1, c).astype(np.float32) * 0.2)

        def loss_pallas(x, ker):
            return jnp.sum(jnp.sin(depthwise_conv2d_pallas(x, ker)))

        def loss_xla(x, ker):
            return jnp.sum(jnp.sin(xla_depthwise(x, ker, k // 2)))

        gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, ker)
        gx_r, gw_r = jax.grad(loss_xla, argnums=(0, 1))(x, ker)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                                   atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                                   atol=2e-3, rtol=2e-4)
