"""Token-2D fused LN/matmul/MLP kernels (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thyroid_tpu.models.vit.swin import manual_layer_norm
from thyroid_tpu.ops.token_fused import fused_ln_matmul, fused_ln_mlp_residual

RS = np.random.RandomState(11)


@pytest.mark.unit
class TestFusedLnMatmul:
    def _case(self, lead, c, out_dim, use_bias):
        x = jnp.asarray(RS.randn(*lead, c).astype(np.float32))
        g = jnp.asarray((1 + 0.1 * RS.randn(c)).astype(np.float32))
        b = jnp.asarray((0.1 * RS.randn(c)).astype(np.float32))
        w = jnp.asarray((RS.randn(c, out_dim) / np.sqrt(c))
                        .astype(np.float32))
        wb = jnp.asarray((0.1 * RS.randn(out_dim)).astype(np.float32)) \
            if use_bias else None
        got = fused_ln_matmul(x, g, b, w, wb, interpret=True)
        want = manual_layer_norm(x, g, b, jnp.float32) @ w
        if use_bias:
            want = want + wb
        assert got.shape == (*lead, out_dim)
        assert np.abs(np.asarray(got) - np.asarray(want)).max() < 1e-5

    def test_3d_lead_with_bias(self):
        self._case((2, 16, 16), 96, 288, True)

    def test_2d_lead_no_bias(self):
        self._case((4, 64), 128, 384, False)


@pytest.mark.unit
class TestFusedLnMlpResidual:
    def _case(self, lead, c, hidden):
        x = jnp.asarray(RS.randn(*lead, c).astype(np.float32))
        g = jnp.asarray((1 + 0.1 * RS.randn(c)).astype(np.float32))
        b = jnp.asarray((0.1 * RS.randn(c)).astype(np.float32))
        w1 = jnp.asarray((RS.randn(c, hidden) / np.sqrt(c))
                         .astype(np.float32))
        b1 = jnp.asarray((0.1 * RS.randn(hidden)).astype(np.float32))
        w2 = jnp.asarray((RS.randn(hidden, c) / np.sqrt(hidden))
                         .astype(np.float32))
        b2 = jnp.asarray((0.1 * RS.randn(c)).astype(np.float32))
        got = fused_ln_mlp_residual(x, g, b, w1, b1, w2, b2, interpret=True)
        y = manual_layer_norm(x, g, b, jnp.float32)
        y = jax.nn.gelu(y @ w1 + b1, approximate=False)
        want = x + (y @ w2 + b2)
        assert got.shape == x.shape
        assert np.abs(np.asarray(got) - np.asarray(want)).max() < 2e-5

    def test_single_hidden_chunk(self):
        self._case((2, 8, 8), 96, 384)

    def test_hidden_chunked_accumulation(self):
        # hidden 1024 > the 512 chunk → exercises the sequential-grid
        # f32 accumulator across n_hc = 2 chunks
        self._case((2, 64), 128, 1024)
