"""Pallas fused window-attention kernel correctness (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thyroid_tpu.models.base import create_and_init
from thyroid_tpu.ops.attention import (
    fused_window_attention, window_attention_reference,
)

RS = np.random.RandomState(3)


@pytest.mark.unit
class TestFusedWindowAttention:
    def _qkvb(self, bw=8, h=3, n=49, d=32):
        mk = lambda: jnp.asarray(RS.randn(bw, h, n, d).astype(np.float32))
        bias = jnp.asarray((RS.randn(h, n, n) * 0.1).astype(np.float32))
        return mk(), mk(), mk(), bias

    def test_matches_reference_no_mask(self):
        q, k, v, bias = self._qkvb()
        want = np.asarray(window_attention_reference(q, k, v, bias))
        got = np.asarray(fused_window_attention(q, k, v, bias, interpret=True))
        assert np.abs(got - want).max() < 1e-5

    def test_matches_reference_with_shift_mask(self):
        q, k, v, bias = self._qkvb()
        mask = jnp.asarray(
            np.where(RS.rand(4, 49, 49) > 0.8, -100.0, 0.0).astype(np.float32))
        want = np.asarray(window_attention_reference(q, k, v, bias, mask))
        got = np.asarray(fused_window_attention(q, k, v, bias, mask,
                                                interpret=True))
        assert np.abs(got - want).max() < 1e-5

    def test_odd_token_padding(self):
        # N=49 pads to 64 internally; padded keys must get zero probability
        q, k, v, bias = self._qkvb(n=49)
        got = np.asarray(fused_window_attention(q, k, v, bias, interpret=True))
        assert got.shape == (8, 3, 49, 32)
        assert np.isfinite(got).all()

    def test_bf16_inputs(self):
        q, k, v, bias = self._qkvb()
        got = np.asarray(fused_window_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), bias, interpret=True)).astype(np.float32)
        want = np.asarray(window_attention_reference(q, k, v, bias))
        assert np.abs(got - want).max() < 0.05

    def test_swin_model_parity(self):
        cfg = {"name": "swin_tiny", "img_size": 32, "in_channels": 1,
               "num_classes": 2,
               "params": {"patch_size": 4, "embed_dim": 16,
                          "depths": [1, 1], "num_heads": [2, 2],
                          "window_size": 4, "drop_path_rate": 0.0}}
        m0, v0 = create_and_init(cfg, jax.random.PRNGKey(0))
        cfg2 = dict(cfg)
        cfg2["params"] = dict(cfg["params"], use_pallas_attention=True)
        m1, _ = create_and_init(cfg2, jax.random.PRNGKey(0))
        x = jnp.asarray(RS.rand(2, 32, 32, 1).astype(np.float32))
        a = np.asarray(m0.apply(v0, x, train=False))
        b = np.asarray(m1.apply(v0, x, train=False))
        assert np.abs(a - b).max() < 1e-5


@pytest.mark.unit
class TestFusedSwinAttention:
    """Round-2 spatial kernel: window partition + head-packed W-MSA +
    window reverse in one kernel (ops/attention.py fused_swin_attention)."""

    def _case(self, B, H, W, C, heads, ws, shift, rows=None):
        from thyroid_tpu.models.vit.swin import (
            shift_attention_mask, window_partition, window_reverse)
        from thyroid_tpu.ops.attention import fused_swin_attention

        n, dh = ws * ws, C // heads
        qkv = jnp.asarray(RS.randn(B, H, W, 3, C).astype(np.float32))
        bias = jnp.asarray((RS.randn(heads, n, n) * 0.1).astype(np.float32))
        mask = shift_attention_mask(H, W, ws, shift)
        mask_j = jnp.asarray(mask) if mask is not None else None
        got = fused_swin_attention(qkv, bias, mask_j, window_size=ws,
                                   num_heads=heads, rows_per_step=rows,
                                   interpret=True)

        def part(t):
            return window_partition(t, ws).reshape(
                -1, n, heads, dh).transpose(0, 2, 1, 3)

        ref = window_attention_reference(part(qkv[:, :, :, 0]),
                                         part(qkv[:, :, :, 1]),
                                         part(qkv[:, :, :, 2]), bias, mask_j)
        ref = window_reverse(ref.transpose(0, 2, 1, 3).reshape(-1, n, C),
                             ws, H, W)
        assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 1e-4

    def test_single_group(self):
        self._case(2, 16, 16, 96, 3, 4, 0)

    def test_multi_group_uneven(self):         # heads 6 → lane groups (4, 2)
        self._case(2, 16, 16, 192, 6, 4, 2)

    def test_shifted_windows(self):
        self._case(2, 14, 14, 384, 12, 7, 3)

    def test_batch_packed_single_window(self):  # res == ws → bt > 1 path
        self._case(6, 7, 7, 768, 24, 7, 0)

    def test_row_tiling(self):
        self._case(2, 16, 16, 96, 3, 4, 0, rows=1)

    def _proj_case(self, B, H, W, C, heads, ws, shift):
        """proj+residual epilogue variant vs the decomposed XLA math."""
        from thyroid_tpu.models.vit.swin import (
            shift_attention_mask, window_partition, window_reverse)
        from thyroid_tpu.ops.attention import fused_swin_block_attention

        n, dh = ws * ws, C // heads
        qkv = jnp.asarray(RS.randn(B, H, W, 3, C).astype(np.float32))
        xres = jnp.asarray(RS.randn(B, H, W, C).astype(np.float32))
        wp = jnp.asarray((RS.randn(C, C) * 0.05).astype(np.float32))
        bp = jnp.asarray((RS.randn(C) * 0.1).astype(np.float32))
        bias = jnp.asarray((RS.randn(heads, n, n) * 0.1).astype(np.float32))
        mask = shift_attention_mask(H, W, ws, shift)
        mask_j = jnp.asarray(mask) if mask is not None else None
        got = fused_swin_block_attention(qkv, xres, wp, bp, bias, mask_j,
                                         window_size=ws, num_heads=heads,
                                         interpret=True)

        def part(t):
            return window_partition(t, ws).reshape(
                -1, n, heads, dh).transpose(0, 2, 1, 3)

        ref = window_attention_reference(part(qkv[:, :, :, 0]),
                                         part(qkv[:, :, :, 1]),
                                         part(qkv[:, :, :, 2]), bias, mask_j)
        ref = window_reverse(ref.transpose(0, 2, 1, 3).reshape(-1, n, C),
                             ws, H, W)
        ref = xres + (ref @ wp + bp)
        assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 1e-4

    def test_proj_residual_epilogue(self):
        self._proj_case(2, 16, 16, 96, 3, 4, 0)

    def test_proj_residual_epilogue_shifted_multigroup(self):
        self._proj_case(2, 14, 14, 384, 12, 7, 3)

    def test_proj_residual_epilogue_batch_packed(self):
        self._proj_case(6, 7, 7, 768, 24, 7, 0)

    def _grad_case(self, B, H, W, C, heads, ws, shift):
        """custom_vjp backward kernel vs XLA autodiff of the same math."""
        from thyroid_tpu.models.vit.swin import (
            shift_attention_mask, window_partition, window_reverse)
        from thyroid_tpu.ops.attention import fused_swin_attention

        n, dh = ws * ws, C // heads
        qkv = jnp.asarray(RS.randn(B, H, W, 3, C).astype(np.float32))
        bias = jnp.asarray((RS.randn(heads, n, n) * 0.1).astype(np.float32))
        mask = shift_attention_mask(H, W, ws, shift)
        mask_j = jnp.asarray(mask) if mask is not None else None
        wvec = jnp.asarray(RS.randn(B, H, W, C).astype(np.float32))

        def loss_fused(qkv, bias):
            out = fused_swin_attention(qkv, bias, mask_j, window_size=ws,
                                       num_heads=heads, interpret=True)
            return (out * wvec).sum()

        def loss_ref(qkv, bias):
            def part(t):
                return window_partition(t, ws).reshape(
                    -1, n, heads, dh).transpose(0, 2, 1, 3)

            ref = window_attention_reference(
                part(qkv[:, :, :, 0]), part(qkv[:, :, :, 1]),
                part(qkv[:, :, :, 2]), bias, mask_j)
            ref = window_reverse(ref.transpose(0, 2, 1, 3).reshape(-1, n, C),
                                 ws, H, W)
            return (ref * wvec).sum()

        g_fused = jax.grad(loss_fused, argnums=(0, 1))(qkv, bias)
        g_ref = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
        for a, b, name in zip(g_fused, g_ref, ("dqkv", "dbias")):
            a, b = np.asarray(a), np.asarray(b)
            denom = max(np.abs(b).max(), 1.0)
            assert np.abs(a - b).max() / denom < 2e-5, \
                (name, np.abs(a - b).max())

    def test_grad_single_group(self):
        self._grad_case(2, 8, 8, 96, 3, 4, 0)

    def test_grad_multi_group_shifted(self):   # heads 6 → lane groups (4, 2)
        self._grad_case(2, 8, 8, 192, 6, 4, 2)

    def test_grad_batch_packed(self):          # res == ws → bt > 1 path
        self._grad_case(4, 4, 4, 128, 4, 4, 0)

    def _ln_case(self, B, H, W, C, heads, ws, shift):
        """LN+QKV-fusing serving kernel vs the same math composed in XLA."""
        from thyroid_tpu.models.vit.swin import (
            manual_layer_norm, shift_attention_mask, window_partition,
            window_reverse)
        from thyroid_tpu.ops.attention import fused_swin_ln_attention

        n, dh = ws * ws, C // heads
        x = jnp.asarray(RS.randn(B, H, W, C).astype(np.float32))
        g = jnp.asarray((1 + 0.1 * RS.randn(C)).astype(np.float32))
        bln = jnp.asarray((0.1 * RS.randn(C)).astype(np.float32))
        wqkv = jnp.asarray((RS.randn(C, 3 * C) / np.sqrt(C))
                           .astype(np.float32))
        bqkv = jnp.asarray((0.1 * RS.randn(3 * C)).astype(np.float32))
        bias = jnp.asarray((RS.randn(heads, n, n) * 0.1).astype(np.float32))
        mask = shift_attention_mask(H, W, ws, shift)
        mask_j = jnp.asarray(mask) if mask is not None else None

        got = fused_swin_ln_attention(
            x, g, bln, wqkv, bqkv, bias, mask_j, window_size=ws,
            num_heads=heads, interpret=True)

        xn = manual_layer_norm(x, g, bln, jnp.float32)
        qkv = xn @ wqkv + bqkv

        def part(t):
            return window_partition(t, ws).reshape(
                -1, n, heads, dh).transpose(0, 2, 1, 3)

        want = window_attention_reference(
            part(qkv[..., :C]), part(qkv[..., C:2 * C]),
            part(qkv[..., 2 * C:]), bias, mask_j)
        want = window_reverse(
            want.transpose(0, 2, 1, 3).reshape(-1, n, C), ws, H, W)
        assert np.abs(np.asarray(got) - np.asarray(want)).max() < 2e-5

    def test_ln_qkv_fused_single_group(self):
        self._ln_case(2, 8, 8, 96, 3, 4, 0)

    def test_ln_qkv_fused_multi_group_shifted(self):
        self._ln_case(2, 8, 8, 192, 6, 4, 2)

    def test_ln_qkv_fused_no_bias_batch_packed(self):
        from thyroid_tpu.models.vit.swin import manual_layer_norm
        from thyroid_tpu.ops.attention import fused_swin_ln_attention

        C, heads, ws = 128, 4, 4
        x = jnp.asarray(RS.randn(4, 4, 4, C).astype(np.float32))
        g = jnp.ones((C,), jnp.float32)
        bln = jnp.zeros((C,), jnp.float32)
        wqkv = jnp.asarray((RS.randn(C, 3 * C) / np.sqrt(C))
                           .astype(np.float32))
        n = ws * ws
        bias = jnp.asarray((RS.randn(heads, n, n) * 0.1).astype(np.float32))
        got = fused_swin_ln_attention(x, g, bln, wqkv, None, bias, None,
                                      window_size=ws, num_heads=heads,
                                      interpret=True)
        from thyroid_tpu.models.vit.swin import (window_partition,
                                                 window_reverse)
        xn = manual_layer_norm(x, g, bln, jnp.float32)
        qkv = xn @ wqkv
        dh = C // heads

        def part(t):
            return window_partition(t, ws).reshape(
                -1, n, heads, dh).transpose(0, 2, 1, 3)

        want = window_attention_reference(
            part(qkv[..., :C]), part(qkv[..., C:2 * C]),
            part(qkv[..., 2 * C:]), bias, None)
        want = window_reverse(
            want.transpose(0, 2, 1, 3).reshape(-1, n, C), ws, 4, 4)
        assert np.abs(np.asarray(got) - np.asarray(want)).max() < 2e-5

    @pytest.mark.parametrize("token_kernels", [False, True])
    def test_model_train_grads_fused_equals_xla(self, token_kernels):
        """swin param grads identical with the Pallas train path on/off —
        both without and with the opt-in LN+QKV / LN+MLP training kernels
        (train_token_kernels; custom_vjp in ops/token_fused.py)."""
        from thyroid_tpu.models import ModelRegistry

        params = {"patch_size": 4, "embed_dim": 32, "depths": [1, 1],
                  "num_heads": [2, 4], "window_size": 4,
                  "drop_path_rate": 0.0, "drop_rate": 0.0}
        x = jnp.asarray(RS.rand(2, 32, 32, 1).astype(np.float32))
        y = jnp.asarray(np.array([0, 1], np.int32))
        grads = {}
        for up in (False, True):
            m = ModelRegistry.create_model(
                {"name": "swin_tiny", "img_size": 32, "in_channels": 1,
                 "num_classes": 2, "use_pallas_attention": up,
                 "train_token_kernels": up and token_kernels,
                 "params": params})
            v = m.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)},
                       jnp.zeros((1, 32, 32, 1)), train=False)

            def loss(p):
                logits = m.apply({"params": p}, x, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(2)})
                lp = jax.nn.log_softmax(logits)
                return -lp[jnp.arange(2), y].mean()

            grads[up] = jax.grad(loss)(v["params"])
        flat_t, _ = jax.tree.flatten(grads[True])
        flat_f, _ = jax.tree.flatten(grads[False])
        for a, b in zip(flat_t, flat_f):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=5e-4)

    def test_model_level_fused_equals_xla(self):
        """swin_tiny outputs identical with use_pallas_attention on/off."""
        from thyroid_tpu.models import ModelRegistry

        params = {"patch_size": 4, "embed_dim": 32, "depths": [2, 2],
                  "num_heads": [2, 4], "window_size": 4,
                  "drop_path_rate": 0.0}
        x = jnp.asarray(RS.rand(2, 32, 32, 1).astype(np.float32))
        outs = {}
        for up in (False, True):
            m = ModelRegistry.create_model(
                {"name": "swin_tiny", "img_size": 32, "in_channels": 1,
                 "num_classes": 2, "use_pallas_attention": up,
                 "params": params})
            v = m.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)},
                       jnp.zeros((1, 32, 32, 1)), train=False)
            outs[up] = np.asarray(m.apply(v, x, train=False))
        assert np.abs(outs[True] - outs[False]).max() < 1e-4
