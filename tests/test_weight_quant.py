"""Quantized decoder weights (ops/weight_quant.py, config weight_quant):
bf16 side-car must be bit-identical to the normal path; int8 must track
it within quantization error; the collection plumbs through init_model /
greedy_decode / with_decode_overrides."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yourmt3_tpu.config.model import T5_TINY
from yourmt3_tpu.models.layers import QuantDense
from yourmt3_tpu.models.ymt3 import YMT3
from yourmt3_tpu.ops.weight_quant import quantize_decoder_weights


def _tiny_bundle(**overrides):
    from yourmt3_tpu.api import init_model
    return init_model("t5_tiny", "mt3_full_plus", **overrides)


class TestQuantDense:
    def _params_and_x(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((3, 5, 32)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((32, 48)) * 0.3, jnp.float32)
        return {"params": {"kernel": w}}, x, w

    def test_matches_nn_dense_without_collection(self):
        from flax import linen as nn
        params, x, w = self._params_and_x()
        ref = nn.Dense(48, use_bias=False, dtype=jnp.bfloat16).apply(
            params, x)
        got = QuantDense(48, dtype=jnp.bfloat16).apply(params, x)
        assert got.dtype == ref.dtype
        assert jnp.array_equal(got, ref), "QuantDense must be bit-identical"

    def test_bf16_sidecar_bit_identical(self):
        params, x, w = self._params_and_x()
        plain = QuantDense(48, dtype=jnp.bfloat16).apply(params, x)
        q = {"kernel_q": w.astype(jnp.bfloat16)}
        got = QuantDense(48, dtype=jnp.bfloat16).apply(
            {"params": params["params"], "qweights": q}, x)
        assert jnp.array_equal(got, plain)

    def test_int8_sidecar_error_bound(self):
        params, x, w = self._params_and_x()
        want = (x.astype(jnp.float32) @ w).astype(jnp.float32)
        wnp = np.asarray(w)
        scale = np.maximum(np.abs(wnp).max(axis=0), 1e-12) / 127.0
        qk = np.clip(np.rint(wnp / scale), -127, 127).astype(np.int8)
        q = {"kernel_q": jnp.asarray(qk),
             "kernel_scale": jnp.asarray(scale, jnp.float32)}
        got = QuantDense(48, dtype=jnp.bfloat16).apply(
            {"params": params["params"], "qweights": q}, x)
        # int8 weight rounding ~0.4% + bf16 activations: generous 3% of
        # the output scale
        denom = float(jnp.max(jnp.abs(want))) + 1e-6
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want)))
        assert err / denom < 0.03, (err, denom)


class TestQuantizeTree:
    def test_decoder_tree_shapes(self):
        bundle = _tiny_bundle()
        q = quantize_decoder_weights(bundle.params, "int8")
        dec = q["decoder"]
        # T5 decoder: every attention projection + FF + lm_head present
        lyr = dec["layer_0"]
        for attn in ("self_attn", "cross_attn"):
            for proj in ("q", "k", "v", "o"):
                node = lyr[attn][proj]
                assert node["kernel_q"].dtype == jnp.int8
                assert node["kernel_scale"].shape == (
                    node["kernel_q"].shape[1],)
        assert "wi_0" in lyr["ff"] and "wo" in lyr["ff"]
        assert dec["lm_head"]["kernel_q"].dtype == jnp.int8
        # embed / rel_bias / norms are not Dense kernels → absent
        assert "embed" not in dec and "rel_bias" not in dec

    def test_bf16_mode_has_no_scales(self):
        bundle = _tiny_bundle()
        q = quantize_decoder_weights(bundle.params, "bf16")
        node = q["decoder"]["lm_head"]
        assert node["kernel_q"].dtype == jnp.bfloat16
        assert "kernel_scale" not in node

    def test_bad_mode_rejected(self):
        bundle = _tiny_bundle()
        with pytest.raises(ValueError):
            quantize_decoder_weights(bundle.params, "none")
        with pytest.raises(ValueError):
            T5_TINY.replace(weight_quant="int4")


@pytest.mark.slow
class TestDecodeWithQuantWeights:
    def _decode(self, bundle, audio_feats, L=16):
        from yourmt3_tpu.models.decoding import greedy_decode
        mem = bundle.model.apply(bundle.params, audio_feats,
                                 method=YMT3.encode)
        return np.asarray(greedy_decode(bundle.model, bundle.params, mem, L,
                                        ban_eos=True))

    def test_bf16_tokens_identical_and_int8_runs(self):
        rng = np.random.default_rng(3)
        base = _tiny_bundle()
        F = base.audio_cfg.num_feature_bins
        feats = jnp.asarray(rng.standard_normal((2, 16, F)), jnp.float32)
        ids0 = self._decode(base, feats)

        bf16 = _tiny_bundle(weight_quant="bf16")
        assert "qweights" in bf16.params
        bf16.params = dict(bf16.params)
        bf16.params["params"] = base.params["params"]
        bf16.with_decode_overrides()  # re-derive qweights from shared params
        ids1 = self._decode(bf16, feats)
        np.testing.assert_array_equal(ids0, ids1)

        i8 = _tiny_bundle(weight_quant="int8")
        i8.params = dict(i8.params)
        i8.params["params"] = base.params["params"]
        i8.with_decode_overrides()
        ids2 = self._decode(i8, feats)
        assert ids2.shape == ids0.shape  # runs; tokens may differ (rounding)

        # logits of one decode step stay close to exact
        mem = base.model.apply(base.params, feats, method=YMT3.encode)
        tok = jnp.zeros((2, 1), jnp.int32)
        kv_b = base.model.empty_self_kvs(2, 16)
        cross_b = base.model.apply(base.params, mem, method=YMT3.init_cross_kv)
        log_b, _ = base.model.apply(base.params, tok, jnp.asarray(0), kv_b,
                                    cross_b, method=YMT3.decode_step)
        cross_q = i8.model.apply(i8.params, mem, method=YMT3.init_cross_kv)
        log_q, _ = i8.model.apply(i8.params, tok, jnp.asarray(0),
                                  i8.model.empty_self_kvs(2, 16), cross_q,
                                  method=YMT3.decode_step)
        scale = float(jnp.max(jnp.abs(log_b))) + 1e-6
        err = float(jnp.max(jnp.abs(log_b - log_q)))
        assert err / scale < 0.05, (err, scale)

    def test_none_mode_drops_collection(self):
        b = _tiny_bundle(weight_quant="int8")
        assert "qweights" in b.params
        b.with_decode_overrides(weight_quant="none")
        assert "qweights" not in b.params

    def test_composes_with_int8_kv(self):
        rng = np.random.default_rng(4)
        b = _tiny_bundle(weight_quant="int8", kv_quant="int8")
        F = b.audio_cfg.num_feature_bins
        feats = jnp.asarray(rng.standard_normal((1, 16, F)), jnp.float32)
        ids = self._decode(b, feats)
        assert ids.shape[-1] == 16

    def test_composes_with_phases_unroll(self):
        """The tuned decode configs bench uses (phases/unroll) must stay
        token-identical when the qweights side-car is active (bf16 mode is
        exact, so tokens must match the plain decode bit-for-bit)."""
        from yourmt3_tpu.models.decoding import greedy_decode
        rng = np.random.default_rng(5)
        base = _tiny_bundle()
        F = base.audio_cfg.num_feature_bins
        feats = jnp.asarray(rng.standard_normal((2, 16, F)), jnp.float32)
        mem = base.model.apply(base.params, feats, method=YMT3.encode)
        want = np.asarray(greedy_decode(base.model, base.params, mem, 16,
                                        ban_eos=True))

        bf16 = _tiny_bundle(weight_quant="bf16", kv_quant="int8")
        bf16.params = dict(bf16.params)
        bf16.params["params"] = base.params["params"]
        bf16.with_decode_overrides()
        mem_q = bf16.model.apply(bf16.params, feats, method=YMT3.encode)
        got = np.asarray(greedy_decode(bf16.model, bf16.params, mem_q, 16,
                                       ban_eos=True, phases=2, unroll=2))
        # int8 KV rounding can flip near-ties, but on this seed/model the
        # paths agree; what this locks is that the composed program runs
        # and bf16 weights change nothing (compare vs int8-KV plain decode)
        plain = np.asarray(greedy_decode(bf16.model, bf16.params, mem_q, 16,
                                         ban_eos=True))
        np.testing.assert_array_equal(got, plain)
        assert got.shape == want.shape

        i8 = _tiny_bundle(weight_quant="int8", kv_quant="int8c4")
        i8.params = dict(i8.params)
        i8.params["params"] = base.params["params"]
        i8.with_decode_overrides()
        out = np.asarray(greedy_decode(i8.model, i8.params, mem_q, 16,
                                       ban_eos=True, phases=2, unroll=2))
        assert out.shape == want.shape
