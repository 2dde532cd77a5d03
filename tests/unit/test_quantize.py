"""Int8 PTQ serving path (serving/quantize.py): numerics, eligibility
gating, engine integration. CPU: the s8×s8→s32 dot/conv path is portable
XLA; only the 2× MXU rate is TPU-specific."""
import re

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thyroid_tpu.models.base import create_and_init
from thyroid_tpu.serving import InferenceEngine, QuantConfig, quantized_apply
from thyroid_tpu.serving.quantize import (_quantize_act, _quantize_weight,
                                          int8_serving)


@pytest.mark.unit
class TestQuantPrimitives:
    def test_weight_roundtrip_error_bounded(self):
        rs = np.random.RandomState(0)
        w = jnp.asarray(rs.randn(3, 3, 16, 32).astype(np.float32))
        wq, sw = _quantize_weight(w, out_axis=3)
        assert wq.dtype == jnp.int8
        assert sw.shape == (32,)
        deq = wq.astype(jnp.float32) * sw
        # symmetric 8-bit: error ≤ s/2 per element, per out-channel scale
        err = np.abs(np.asarray(deq - w))
        bound = np.asarray(sw) * 0.5 + 1e-7
        assert (err <= bound[None, None, None, :]).all()

    def test_act_quant_per_tensor(self):
        x = jnp.asarray([[0.5, -2.0], [1.0, 0.25]], jnp.float32)
        xq, sx = _quantize_act(x)
        assert xq.dtype == jnp.int8
        np.testing.assert_allclose(float(sx), 2.0 / 127.0, rtol=1e-6)
        assert int(np.abs(np.asarray(xq)).max()) == 127

    def test_zero_input_does_not_nan(self):
        xq, sx = _quantize_act(jnp.zeros((4, 4)))
        assert np.isfinite(float(sx))
        assert int(np.abs(np.asarray(xq)).max()) == 0


class _Toy(nn.Module):
    """Dense + conv + depthwise conv + tiny head — one of each gate."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (3, 3), padding="SAME", use_bias=False,
                    name="conv")(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)],
                    feature_group_count=64, use_bias=False, name="dw")(x)
        x = x.mean(axis=(1, 2))
        x = nn.Dense(128, name="wide")(x)
        x = nn.relu(x)
        return nn.Dense(2, name="head")(x)


@pytest.mark.unit
class TestInterceptor:
    @pytest.fixture(scope="class")
    def toy(self):
        m = _Toy()
        v = m.init(jax.random.PRNGKey(0), jnp.ones((1, 16, 16, 33)))
        rs = np.random.RandomState(1)
        x = jnp.asarray(rs.rand(4, 16, 16, 33).astype(np.float32))
        return m, v, x

    def test_quantized_close_to_float(self, toy):
        m, v, x = toy
        ref = m.apply(v, x)
        out = quantized_apply(m, v, x)
        assert out.shape == ref.shape
        # 8-bit dynamic-symmetric PTQ on a 2-contraction path: percent-level
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0.08, atol=0.08)

    def test_int8_ops_present_and_gated(self, toy):
        m, v, x = toy

        def f(v, x):
            with int8_serving():
                return m.apply(v, x)

        txt = str(jax.make_jaxpr(f)(v, x))
        # conv (64ch) + wide Dense quantized → s8 convert + s32 accum present
        assert "convert_element_type[new_dtype=int8" in txt
        assert "preferred_element_type=int32" in txt
        # exactly TWO quantized contractions (conv + wide Dense): the
        # depthwise conv and the 2-feature head stay float. Each quantized
        # layer converts its activation and weight to s8 → 4 converts; op
        # params print multiline, so match within the bracketed param list.
        assert txt.count("convert_element_type[new_dtype=int8") == 4
        assert txt.count("preferred_element_type=int32") == 2
        assert len(re.findall(
            r"conv_general_dilated\[[^\]]*preferred_element_type=int32",
            txt, re.S)) == 1  # the other s32 accumulation is the Dense dot

    def test_min_features_gate(self, toy):
        m, v, x = toy

        def f(v, x):
            with int8_serving(QuantConfig(min_features=10_000)):
                return m.apply(v, x)

        txt = str(jax.make_jaxpr(f)(v, x))
        assert "int8" not in txt  # everything skipped → pure float program

    def test_init_under_interceptor_matches_param_tree(self):
        # the interceptor declares params with the module's own init/shape,
        # so init inside the context produces the identical tree
        m = _Toy()
        v = m.init(jax.random.PRNGKey(0), jnp.ones((1, 16, 16, 33)))
        with int8_serving():
            v2 = m.init(jax.random.PRNGKey(0), jnp.ones((1, 16, 16, 33)))
        assert jax.tree.structure(v) == jax.tree.structure(v2)
        for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(v2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.unit
class TestModelLevel:
    @pytest.mark.parametrize("name", ["efficientnet_b0", "vit_tiny"])
    def test_top1_agreement(self, name):
        mcfg = {"name": name, "img_size": 64, "in_channels": 1,
                "num_classes": 2,
                "params": {"patch_size": 8} if name == "vit_tiny" else {}}
        model, variables = create_and_init(mcfg, jax.random.PRNGKey(0))
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.rand(8, 64, 64, 1).astype(np.float32))
        ref = model.apply(variables, x, train=False)
        out = quantized_apply(model, variables, x, train=False)
        ref = ref[0] if isinstance(ref, tuple) else ref
        out = out[0] if isinstance(out, tuple) else out
        # randomly-initialised logits are near zero; demand argmax agreement
        # on a strong majority plus bounded logit drift
        agree = (np.argmax(np.asarray(ref), -1)
                 == np.argmax(np.asarray(out), -1)).mean()
        assert agree >= 0.75, agree
        assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 0.5


@pytest.mark.unit
class TestEngineIntegration:
    def test_engine_quantized_predict(self):
        mcfg = {"name": "resnet18", "img_size": 32, "in_channels": 1,
                "num_classes": 2}
        eng_f = InferenceEngine(model_config=mcfg, buckets=(4,),
                                raw_inputs=False)
        eng_q = InferenceEngine(model_config=mcfg, buckets=(4,),
                                raw_inputs=False, quantize="int8",
                                variables=eng_f.variables)
        rs = np.random.RandomState(0)
        imgs = rs.rand(4, 32, 32, 1).astype(np.float32)
        pf = eng_f.predict(imgs)
        pq = eng_q.predict(imgs)
        np.testing.assert_allclose(pq.sum(axis=-1), 1.0, atol=1e-5)
        # probabilities stay close on a 2-class head
        assert np.abs(pf - pq).max() < 0.15

    def test_engine_rejects_unknown_mode(self):
        with pytest.raises(ValueError):
            InferenceEngine(model_config={"name": "resnet18", "img_size": 32,
                                          "in_channels": 1, "num_classes": 2},
                            raw_inputs=False, quantize="fp4")
