"""Registry-wide model contract test — create every registered model and
forward a synthetic batch (reference: tests/unit/test_models.py:30-83, the
19-name parametrized contract test; here all 25 registered names).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thyroid_tpu.models import (
    ModelRegistry, create_and_init, forward, num_parameters,
)

# (name, img_size) — natural sizes; small models get small inputs for speed
LIGHT_MODELS = [
    ("resnet18", 64), ("resnet34", 64), ("resnet50", 64),
    ("densenet121", 64), ("efficientnet_b0", 64), ("efficientnet_b1", 64),
    ("vit_tiny", 64), ("vit_small", 64),
    ("deit_tiny", 64), ("deit_small", 64),
    ("swin_tiny", 224),
]
HEAVY_MODELS = [
    ("resnet101", 64), ("densenet161", 64), ("densenet169", 64),
    ("densenet201", 64), ("efficientnet_b2", 64), ("efficientnet_b3", 64),
    ("inception_v3", 299), ("inception_v4", 299),
    ("vit_base", 64), ("deit_base", 64),
    ("swin_small", 224), ("swin_base", 224), ("swin_large", 224),
    ("swin_medical", 224),
]


def _forward_contract(name, img_size):
    cfg = {"name": name, "img_size": img_size, "in_channels": 1,
           "num_classes": 2, "pretrained": False}
    model, variables = create_and_init(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(2, img_size, img_size, 1)
                    .astype(np.float32))
    out, _, _ = forward(model, variables, x, train=False)
    assert not isinstance(out, tuple)
    assert out.shape == (2, 2)
    assert np.isfinite(np.asarray(out)).all()
    assert num_parameters(variables) > 1e5
    # train-mode forward must also work (dropout rng, mutable batch_stats)
    out_t, batch_stats, _ = forward(model, variables, x, train=True,
                                    rng=jax.random.PRNGKey(1))
    if isinstance(out_t, tuple):  # inception aux / deit dual-head
        assert all(o.shape == (2, 2) for o in out_t)
    else:
        assert out_t.shape == (2, 2)


@pytest.mark.unit
@pytest.mark.parametrize("name,img_size", LIGHT_MODELS)
def test_model_contract(name, img_size):
    _forward_contract(name, img_size)


@pytest.mark.slow
@pytest.mark.parametrize("name,img_size", HEAVY_MODELS)
def test_model_contract_heavy(name, img_size):
    _forward_contract(name, img_size)


@pytest.mark.unit
class TestRegistry:
    def test_all_reference_names_registered(self):
        """Every model name the reference registry carries must exist here
        (reference: src/models/registry.py + src/models/vit/__init__.py:7-23),
        plus the from-scratch extras (swin_large/medical, ensemble)."""
        listed = ModelRegistry.list_models()
        all_names = set(listed["cnn"]) | set(listed["vit"]) | set(listed["ensemble"])
        expected = {
            "resnet18", "resnet34", "resnet50", "resnet101",
            "densenet121", "densenet161", "densenet169", "densenet201",
            "efficientnet_b0", "efficientnet_b1", "efficientnet_b2", "efficientnet_b3",
            "inception_v3", "inception_v4",
            "vit_tiny", "vit_small", "vit_base",
            "deit_tiny", "deit_small", "deit_base",
            "swin_tiny", "swin_small", "swin_base", "swin_large", "swin_medical",
            "cnn_ensemble",
        }
        assert expected <= all_names

    def test_unknown_model_raises(self):
        with pytest.raises(ValueError, match="unknown model"):
            ModelRegistry.create_model({"name": "resnet9000"})

    def test_model_type_lookup(self):
        assert ModelRegistry.model_type("resnet50") == "cnn"
        assert ModelRegistry.model_type("swin_tiny") == "vit"


@pytest.mark.unit
class TestParamCounts:
    """Parameter-count windows (reference: tests/test_vit_models.py:131-160 —
    tiny ~5.7M, small ~22M, base ~86M; CNN counts from BASELINE.md)."""

    @pytest.mark.parametrize("name,img,lo,hi", [
        ("vit_tiny", 64, 5.0e6, 6.5e6),
        ("resnet18", 64, 10.5e6, 12.0e6),
        ("resnet50", 64, 22.5e6, 26.0e6),
        ("efficientnet_b0", 64, 3.5e6, 4.5e6),
        ("densenet121", 64, 6.4e6, 8.2e6),
    ])
    def test_window(self, name, img, lo, hi):
        _, variables = create_and_init(
            {"name": name, "img_size": img, "in_channels": 1, "num_classes": 2},
            jax.random.PRNGKey(0))
        n = num_parameters(variables)
        assert lo <= n <= hi, f"{name}: {n/1e6:.2f}M params outside [{lo/1e6},{hi/1e6}]M"


@pytest.mark.unit
class TestModelBehaviors:
    def test_inception_aux_finite_below_canonical_size(self):
        """At 224² the aux branch reaches its 5×5 conv with a 3×3 grid;
        VALID there would emit a zero-size map and a NaN mean (the round-2
        demo NaN) — the SAME-padding fallback must keep aux finite."""
        model, variables = create_and_init(
            {"name": "inception_v3", "img_size": 224}, jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.RandomState(3).rand(2, 224, 224, 1)
                        .astype(np.float32))
        out, _, _ = forward(model, variables, x, train=True,
                            rng=jax.random.PRNGKey(1))
        assert isinstance(out, tuple) and len(out) == 2
        for o in out:
            assert np.isfinite(np.asarray(o)).all()

    def test_deit_train_returns_two_heads(self):
        model, variables = create_and_init(
            {"name": "deit_tiny", "img_size": 64}, jax.random.PRNGKey(0))
        x = jnp.zeros((2, 64, 64, 1))
        out, _, _ = forward(model, variables, x, train=True,
                            rng=jax.random.PRNGKey(1))
        assert isinstance(out, tuple) and len(out) == 2
        # eval averages the heads
        out_eval, _, _ = forward(model, variables, x, train=False)
        assert out_eval.shape == (2, 2)

    def test_vit_attention_capture(self):
        model, variables = create_and_init(
            {"name": "vit_tiny", "img_size": 64}, jax.random.PRNGKey(0))
        x = jnp.zeros((2, 64, 64, 1))
        out, _, inter = forward(model, variables, x, train=False, capture=True)
        flat = jax.tree.leaves(inter)
        # 12 blocks of attention + final tokens (+ nothing else for non-quality)
        attn_maps = [v for v in flat if v.ndim == 4 and v.shape[-1] == v.shape[-2]]
        assert len(attn_maps) == 12
        # attention rows sum to 1 (reference: tests/test_attention_quality.py:86)
        assert np.allclose(np.asarray(attn_maps[0]).sum(-1), 1.0, atol=1e-4)

    def test_vit_quality_aware_scores(self):
        model, variables = create_and_init(
            {"name": "vit_tiny", "img_size": 64, "quality_aware": True},
            jax.random.PRNGKey(0))
        x = jnp.zeros((2, 64, 64, 1))
        _, _, inter = forward(model, variables, x, train=False, capture=True)
        scores = inter["patch_embed"]["patch_quality"][0]
        assert scores.shape == (2, 16)  # 64/16 = 4 → 16 patches
        assert (np.asarray(scores) >= 0).all() and (np.asarray(scores) <= 1).all()

    def test_swin_uncertainty_head(self):
        model, variables = create_and_init(
            {"name": "swin_tiny", "img_size": 224, "medical_adaptations": True},
            jax.random.PRNGKey(0))
        x = jnp.zeros((1, 224, 224, 1))
        out = model.apply(variables, x, train=False, return_uncertainty=True)
        logits, uncertainty = out
        assert logits.shape == (1, 2) and uncertainty.shape == (1, 2)

    def test_gradients_flow(self):
        model, variables = create_and_init(
            {"name": "vit_tiny", "img_size": 64}, jax.random.PRNGKey(0))
        x = jnp.ones((2, 64, 64, 1))

        def loss_fn(params):
            out = model.apply({"params": params}, x, train=False)
            return out.sum()

        grads = jax.grad(loss_fn)(variables["params"])
        gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
        assert gnorm > 0

    def test_determinism_eval(self):
        model, variables = create_and_init(
            {"name": "resnet18", "img_size": 64}, jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 1).astype(np.float32))
        a, _, _ = forward(model, variables, x, train=False)
        b, _, _ = forward(model, variables, x, train=False)
        assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.unit
class TestResNetHelpers:
    """Reference's retained helper modules (src/models/cnn/resnet.py:24-52)."""

    def test_spatial_attention_gates_features(self):
        from thyroid_tpu.models.cnn.resnet import SpatialAttention

        mod = SpatialAttention()
        x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 16)
                        .astype(np.float32))
        variables = mod.init(jax.random.PRNGKey(0), x)
        attended, attention = mod.apply(variables, x)
        assert attended.shape == x.shape
        assert attention.shape == (2, 8, 8, 1)
        a = np.asarray(attention)
        assert a.min() >= 0.0 and a.max() <= 1.0
        assert np.allclose(np.asarray(attended), np.asarray(x) * a)

    def test_quality_encoder_shape(self):
        from thyroid_tpu.models.cnn.resnet import QualityEncoder

        mod = QualityEncoder(hidden_dim=32)
        q = jnp.asarray(np.random.RandomState(1).rand(4, 3).astype(np.float32))
        variables = mod.init(jax.random.PRNGKey(0), q)
        out = mod.apply(variables, q)
        assert out.shape == (4, 32)
        assert np.asarray(out).min() >= 0.0  # relu output


@pytest.mark.unit
class TestShiftDepthwiseConv:
    """ops/depthwise.py must be numerically interchangeable with XLA's
    depthwise conv_general_dilated (the MBConv param trees are shared)."""

    @pytest.mark.parametrize("k,s,c", [(3, 1, 8), (3, 2, 8), (5, 1, 12),
                                       (5, 2, 12)])
    def test_matches_nn_conv(self, k, s, c):
        import flax.linen as nn
        from thyroid_tpu.ops.depthwise import shift_depthwise_conv

        rs = np.random.RandomState(k * 10 + s)
        x = jnp.asarray(rs.rand(2, 17, 17, c).astype(np.float32) * 2 - 1)
        w = jnp.asarray(rs.rand(k, k, 1, c).astype(np.float32) * 0.5 - 0.25)
        conv = nn.Conv(c, (k, k), strides=(s, s),
                       padding=[(k // 2, k // 2)] * 2,
                       feature_group_count=c, use_bias=False)
        want = conv.apply({"params": {"kernel": w}}, x)
        got = shift_depthwise_conv(x, w, strides=s)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

    def test_efficientnet_param_tree_unchanged(self):
        """dw_shift must not move any param path (ckpt/importer contract)."""
        a = create_and_init({"name": "efficientnet_b0", "img_size": 64,
                             "dw_shift_conv": True}, jax.random.PRNGKey(0))[1]
        b = create_and_init({"name": "efficientnet_b0", "img_size": 64,
                             "dw_shift_conv": False}, jax.random.PRNGKey(0))[1]
        pa = jax.tree_util.tree_flatten_with_path(a)[0]
        pb = jax.tree_util.tree_flatten_with_path(b)[0]
        assert [(k, v.shape) for k, v in pa] == [(k, v.shape) for k, v in pb]

    def test_efficientnet_forward_equivalent(self):
        mcfg = {"name": "efficientnet_b0", "img_size": 64}
        model_a, va = create_and_init({**mcfg, "dw_shift_conv": True},
                                      jax.random.PRNGKey(3))
        model_b, _ = create_and_init({**mcfg, "dw_shift_conv": False},
                                     jax.random.PRNGKey(3))
        x = jnp.asarray(np.random.RandomState(1)
                        .rand(2, 64, 64, 1).astype(np.float32))
        la = model_a.apply(va, x, train=False)
        lb = model_b.apply(va, x, train=False)  # same params, other impl
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=2e-4, rtol=1e-4)
