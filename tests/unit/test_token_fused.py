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


def _ln_ref(x, g, b):
    return manual_layer_norm(x, g, b, jnp.float32)


@pytest.mark.unit
class TestFusedGradients:
    """custom_vjp backward kernels vs jax.grad of the XLA reference."""

    def _cmp_grads(self, got, want, names, tol=2e-4):
        for gg, ww, nm in zip(got, want, names):
            gg, ww = np.asarray(gg), np.asarray(ww)
            scale = max(1.0, np.abs(ww).max())
            assert np.abs(gg - ww).max() / scale < tol, \
                f"grad mismatch for {nm}: {np.abs(gg - ww).max()}"

    def test_ln_matmul_grads(self):
        lead, c, out_dim = (2, 24), 96, 288
        x = jnp.asarray(RS.randn(*lead, c).astype(np.float32))
        g = jnp.asarray((1 + 0.1 * RS.randn(c)).astype(np.float32))
        b = jnp.asarray((0.1 * RS.randn(c)).astype(np.float32))
        w = jnp.asarray((RS.randn(c, out_dim) / np.sqrt(c))
                        .astype(np.float32))
        wb = jnp.asarray((0.1 * RS.randn(out_dim)).astype(np.float32))
        cot = jnp.asarray(RS.randn(*lead, out_dim).astype(np.float32))

        def loss_kernel(x, g, b, w, wb):
            return (fused_ln_matmul(x, g, b, w, wb, interpret=True)
                    * cot).sum()

        def loss_ref(x, g, b, w, wb):
            return ((_ln_ref(x, g, b) @ w + wb) * cot).sum()

        got = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(x, g, b, w, wb)
        want = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, g, b, w, wb)
        self._cmp_grads(got, want, ["x", "gamma", "beta", "w", "wb"])

    @pytest.mark.parametrize("residual,hidden", [(True, 384), (False, 384),
                                                 (False, 1024)])
    def test_ln_mlp_grads(self, residual, hidden):
        from thyroid_tpu.ops.token_fused import fused_ln_mlp

        lead, c = (2, 16), 128
        x = jnp.asarray(RS.randn(*lead, c).astype(np.float32))
        g = jnp.asarray((1 + 0.1 * RS.randn(c)).astype(np.float32))
        b = jnp.asarray((0.1 * RS.randn(c)).astype(np.float32))
        w1 = jnp.asarray((RS.randn(c, hidden) / np.sqrt(c))
                         .astype(np.float32))
        b1 = jnp.asarray((0.1 * RS.randn(hidden)).astype(np.float32))
        w2 = jnp.asarray((RS.randn(hidden, c) / np.sqrt(hidden))
                         .astype(np.float32))
        b2 = jnp.asarray((0.1 * RS.randn(c)).astype(np.float32))
        cot = jnp.asarray(RS.randn(*lead, c).astype(np.float32))
        fn = fused_ln_mlp_residual if residual else fused_ln_mlp

        def loss_kernel(x, g, b, w1, b1, w2, b2):
            return (fn(x, g, b, w1, b1, w2, b2, interpret=True) * cot).sum()

        def loss_ref(x, g, b, w1, b1, w2, b2):
            y = jax.nn.gelu(_ln_ref(x, g, b) @ w1 + b1, approximate=False)
            y = y @ w2 + b2
            if residual:
                y = x + y
            return (y * cot).sum()

        args = (x, g, b, w1, b1, w2, b2)
        got = jax.grad(loss_kernel, argnums=tuple(range(7)))(*args)
        want = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
        self._cmp_grads(got, want,
                        ["x", "gamma", "beta", "w1", "b1", "w2", "b2"])

    def test_fused_ln_mlp_forward_no_residual(self):
        from thyroid_tpu.ops.token_fused import fused_ln_mlp

        x = jnp.asarray(RS.randn(2, 8, 96).astype(np.float32))
        g = jnp.ones((96,), jnp.float32)
        b = jnp.zeros((96,), jnp.float32)
        w1 = jnp.asarray((RS.randn(96, 384) / 10).astype(np.float32))
        b1 = jnp.zeros((384,), jnp.float32)
        w2 = jnp.asarray((RS.randn(384, 96) / 20).astype(np.float32))
        b2 = jnp.zeros((96,), jnp.float32)
        got = fused_ln_mlp(x, g, b, w1, b1, w2, b2, interpret=True)
        want = jax.nn.gelu(_ln_ref(x, g, b) @ w1 + b1,
                           approximate=False) @ w2 + b2
        assert np.abs(np.asarray(got) - np.asarray(want)).max() < 2e-5


@pytest.mark.unit
class TestVitBlockTokenKernels:
    """Model-level: the plain-ViT/DeiT serving fast path (Block.token_kernels)
    matches the standard XLA path and creates an identical param tree."""

    def _model_pair(self, cls, **kw):
        m_std = cls(token_kernels=False, **kw)
        m_fus = cls(token_kernels=True, **kw)
        return m_std, m_fus

    @pytest.mark.parametrize("family", ["vit", "deit"])
    def test_fused_matches_standard_and_same_tree(self, family):
        if family == "vit":
            from thyroid_tpu.models.vit.vit import VisionTransformer as cls
        else:
            from thyroid_tpu.models.vit.deit import DeiT as cls
        kw = dict(img_size=32, patch_size=8, in_channels=1, num_classes=2,
                  embed_dim=64, depth=2, num_heads=2, drop_path_rate=0.0)
        m_std, m_fus = self._model_pair(cls, **kw)
        x = jnp.asarray(RS.randn(2, 32, 32, 1).astype(np.float32))
        v_std = m_std.init(jax.random.PRNGKey(0), x, train=False)
        v_fus = m_fus.init(jax.random.PRNGKey(0), x, train=False)
        # identical tree: same names, shapes — checkpoints interchange
        t1 = jax.tree.map(lambda a: (a.shape, a.dtype), v_std["params"])
        t2 = jax.tree.map(lambda a: (a.shape, a.dtype), v_fus["params"])
        assert t1 == t2
        y_std = m_std.apply(v_std, x, train=False)
        y_fus = m_fus.apply(v_std, x, train=False)  # SAME params, fused path
        out_std = np.asarray(jax.tree.leaves(y_std)[0])
        out_fus = np.asarray(jax.tree.leaves(y_fus)[0])
        assert np.abs(out_std - out_fus).max() < 2e-4

    def test_train_path_unaffected_by_flag(self):
        from thyroid_tpu.models.vit.vit import VisionTransformer as cls
        kw = dict(img_size=32, patch_size=8, in_channels=1, num_classes=2,
                  embed_dim=64, depth=1, num_heads=2, drop_path_rate=0.0)
        m_std, m_fus = self._model_pair(cls, **kw)
        x = jnp.asarray(RS.randn(2, 32, 32, 1).astype(np.float32))
        v = m_std.init(jax.random.PRNGKey(0), x, train=False)
        rngs = {"dropout": jax.random.PRNGKey(1)}
        y1 = m_std.apply(v, x, train=True, rngs=rngs)
        y2 = m_fus.apply(v, x, train=True, rngs=rngs)
        assert np.allclose(np.asarray(y1), np.asarray(y2))


@pytest.mark.unit
class TestPaddedTokenBlocks:
    """B·197-style token counts (prime factors) take the padded-block path
    (_pick_block_padded): outputs and gradients must match the XLA math."""

    def test_fwd_matmul_prime_tokens(self):
        x = jnp.asarray(RS.randn(197, 96).astype(np.float32))
        g = jnp.asarray((1 + 0.1 * RS.randn(96)).astype(np.float32))
        b = jnp.asarray((0.1 * RS.randn(96)).astype(np.float32))
        w = jnp.asarray((RS.randn(96, 288) / 10).astype(np.float32))
        wb = jnp.asarray((0.1 * RS.randn(288)).astype(np.float32))
        got = fused_ln_matmul(x, g, b, w, wb, interpret=True)
        want = manual_layer_norm(x, g, b, jnp.float32) @ w + wb
        assert got.shape == (197, 288)
        assert np.abs(np.asarray(got) - np.asarray(want)).max() < 1e-5

    def test_grads_prime_tokens(self):
        x = jnp.asarray(RS.randn(2, 197, 64).astype(np.float32))
        g = jnp.asarray((1 + 0.1 * RS.randn(64)).astype(np.float32))
        b = jnp.asarray((0.1 * RS.randn(64)).astype(np.float32))
        w1 = jnp.asarray((RS.randn(64, 256) / 8).astype(np.float32))
        b1 = jnp.asarray((0.1 * RS.randn(256)).astype(np.float32))
        w2 = jnp.asarray((RS.randn(256, 64) / 16).astype(np.float32))
        b2 = jnp.asarray((0.1 * RS.randn(64)).astype(np.float32))

        def f_fused(*a):
            return (fused_ln_mlp_residual(*a, interpret=True) ** 2).sum()

        def f_ref(x, g, b, w1, b1, w2, b2):
            h = manual_layer_norm(x, g, b, jnp.float32) @ w1 + b1
            h = jax.nn.gelu(h, approximate=False) @ w2 + b2
            return ((x + h) ** 2).sum()

        args = (x, g, b, w1, b1, w2, b2)
        got = jax.grad(f_fused, argnums=(0, 1, 3, 5))(*args)
        want = jax.grad(f_ref, argnums=(0, 1, 3, 5))(*args)
        for gt, wt in zip(got, want):
            denom = max(1e-3, float(np.abs(np.asarray(wt)).max()))
            rel = np.abs(np.asarray(gt) - np.asarray(wt)).max() / denom
            assert rel < 5e-4


@pytest.mark.unit
class TestPickBlockPadded:
    """Block/padding policy — incl. the VMEM-overrun regression: the
    _pick_block fallback returns `total` even when total > limit, which must
    route to the padding branch (vit_base serving bucket B=3: t=591)."""

    def test_divisor_kept_when_decent(self):
        from thyroid_tpu.ops.token_fused import _pick_block_padded
        assert _pick_block_padded(1024, 512) == (512, 1024)

    def test_whole_dim_kept_only_when_it_fits(self):
        from thyroid_tpu.ops.token_fused import _pick_block_padded
        # prime t below the limit: one whole-dim block, no pad
        assert _pick_block_padded(197, 3400) == (197, 197)
        # prime-ish t ABOVE the limit: must pad, never a 591-row block
        tb, tp = _pick_block_padded(591, 138)
        assert tb <= 138 and tb % 8 == 0 and tp % tb == 0 and tp >= 591

    def test_tiny_divisor_routes_to_padding(self):
        from thyroid_tpu.ops.token_fused import _pick_block_padded
        tb, tp = _pick_block_padded(8 * 4507, 4500)
        assert tb == 4496 and tp == 9 * 4496

    def test_fwd_matmul_through_padding_branch(self):
        # t = 8·4507 with the 10 MB budget → limit ≈ 4.5k, divisor only 8 →
        # the kernel really runs the pad/slice path
        t = 8 * 4507
        x = jnp.asarray(RS.randn(t, 96).astype(np.float32))
        g = jnp.asarray((1 + 0.1 * RS.randn(96)).astype(np.float32))
        b = jnp.asarray((0.1 * RS.randn(96)).astype(np.float32))
        w = jnp.asarray((RS.randn(96, 288) / 10).astype(np.float32))
        wb = jnp.asarray((0.1 * RS.randn(288)).astype(np.float32))
        from thyroid_tpu.ops.token_fused import _pick_block_padded
        assert _pick_block_padded(t, 4500)[1] != t  # precondition: pads
        got = fused_ln_matmul(x, g, b, w, wb, interpret=True)
        want = manual_layer_norm(x, g, b, jnp.float32) @ w + wb
        assert got.shape == (t, 288)
        assert np.abs(np.asarray(got) - np.asarray(want)).max() < 2e-5


@pytest.mark.unit
class TestPatchMergingFusion:
    """PatchMerging's serving path fuses LN into the reduction matmul
    (round 3); fused and unfused paths must agree bit-tightly and share
    one param tree (checkpoint/importer compatibility)."""

    def _apply(self, use_pallas, deterministic=True):
        import jax

        from thyroid_tpu.models.vit.swin import PatchMerging

        x = jnp.asarray(
            np.random.RandomState(5).randn(2, 64, 48).astype(np.float32))
        m = PatchMerging((8, 8), 48, use_pallas=use_pallas)
        variables = m.init(jax.random.PRNGKey(0), x)
        return m.apply(variables, x, deterministic), variables

    def test_fused_matches_unfused(self):
        got, v_fused = self._apply(use_pallas=True)
        want, v_plain = self._apply(use_pallas=False)
        assert np.abs(np.asarray(got) - np.asarray(want)).max() < 2e-5
        # identical param trees (norm/{scale,bias}, reduction/kernel)
        import jax

        p1 = jax.tree_util.tree_structure(v_fused["params"])
        p2 = jax.tree_util.tree_structure(v_plain["params"])
        assert p1 == p2

    def test_training_path_is_unfused(self):
        got, _ = self._apply(use_pallas=True, deterministic=False)
        want, _ = self._apply(use_pallas=False, deterministic=False)
        assert np.abs(np.asarray(got) - np.asarray(want)).max() < 2e-5
