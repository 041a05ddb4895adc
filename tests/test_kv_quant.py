"""int8 KV-cache decode: quantization round-trip and logits parity vs the
bf16 dense cache path (ops/kv_quant.py; config kv_quant="int8")."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yourmt3_tpu.ops.kv_quant import (dequantize_kv, int8_decode_attention,
                                      quantize_kv)


class TestQuantPrimitive:
    def test_roundtrip_error_bound(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((4, 2, 16, 32)), jnp.float32)
        q, s = quantize_kv(x)
        back = dequantize_kv(q, s)
        # per-row error bounded by half a quantization step
        step = np.asarray(s)[..., None]
        assert float(jnp.max(jnp.abs(back - x))) <= float(step.max()) * 0.51

    def test_attention_matches_dense(self):
        rng = np.random.default_rng(1)
        S, H, L, dk = 3, 2, 64, 32
        q = jnp.asarray(rng.standard_normal((S, H, 1, dk)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((S, H, L, dk)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((S, H, L, dk)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((1, H, 1, L)), jnp.float32)
        logits = jnp.einsum("shqd,shld->shql", q, k) + bias
        want = jnp.einsum("shql,shld->shqd", jax.nn.softmax(logits, -1), v)
        kq, ks = quantize_kv(k)
        vq, vs = quantize_kv(v)
        got = int8_decode_attention(q, kq, ks, vq, vs, bias)
        # int8 rounding: ~1% relative; softmax output O(1)
        assert float(jnp.max(jnp.abs(want - got))) < 5e-2


@pytest.mark.slow
class TestModelInt8Decode:
    def test_decode_step_logits_close_to_dense(self):
        """Full decode_step with kv_quant=int8 must track the bf16 dense
        path closely (greedy ties aside)."""
        from yourmt3_tpu.config.model import T5_TINY
        from yourmt3_tpu.models.ymt3 import YMT3
        cfg_d = T5_TINY.replace(vocab_size=600, d_kv=16, num_heads=4)
        cfg_q = cfg_d.replace(kv_quant="int8")
        model_d, model_q = YMT3(cfg_d), YMT3(cfg_q)
        feats = jnp.asarray(
            np.random.default_rng(2).standard_normal((1, 16, 24)), jnp.float32)
        params = model_d.init(jax.random.PRNGKey(0), feats,
                              jnp.zeros((1, 1, 8), jnp.int32))
        mem = model_d.apply(params, feats, method=YMT3.encode)
        cross_d = model_d.apply(params, mem, method=YMT3.init_cross_kv)
        cross_q = model_q.apply(params, mem, method=YMT3.init_cross_kv)
        kv_d = model_d.empty_self_kvs(1, 128)
        kv_q = model_q.empty_self_kvs(1, 128)
        tok = jnp.asarray([[42]], jnp.int32)
        for pos in range(4):
            log_d, kv_d = model_d.apply(params, tok, jnp.asarray(pos),
                                        kv_d, cross_d, method=YMT3.decode_step)
            log_q, kv_q = model_q.apply(params, tok, jnp.asarray(pos),
                                        kv_q, cross_q, method=YMT3.decode_step)
            err = float(jnp.max(jnp.abs(log_d - log_q)))
            assert err < 2e-1, (pos, err)
            tok = jnp.argmax(log_d, -1)[:, None].astype(jnp.int32)

    def test_int8_paged_decode_matches_dense(self):
        """kv_quant=int8 + use_pallas_decode: int8 PAGED self-attention
        (∝pos kernel reads at half the bytes) must track the bf16 dense
        path."""
        from yourmt3_tpu.config.model import T5_TINY
        from yourmt3_tpu.models.ymt3 import YMT3
        cfg_d = T5_TINY.replace(vocab_size=600, d_kv=16, num_heads=4)
        cfg_q = cfg_d.replace(kv_quant="int8", use_pallas_decode=True)
        model_d, model_q = YMT3(cfg_d), YMT3(cfg_q)
        feats = jnp.asarray(
            np.random.default_rng(4).standard_normal((2, 16, 24)), jnp.float32)
        params = model_d.init(jax.random.PRNGKey(0), feats,
                              jnp.zeros((2, 1, 8), jnp.int32))
        mem = model_d.apply(params, feats, method=YMT3.encode)
        cross_d = model_d.apply(params, mem, method=YMT3.init_cross_kv)
        cross_q = model_q.apply(params, mem, method=YMT3.init_cross_kv)
        kv_d = model_d.empty_self_kvs(2, 128)
        kv_q = model_q.empty_self_kvs(2, 128)
        # paged int8 cache structure: ((values, scales), (values, scales))
        assert kv_q[0][0][0].dtype == jnp.int8
        assert kv_q[0][0][0].ndim == 5 and kv_q[0][0][1].ndim == 4
        tok = jnp.asarray([[42], [7]], jnp.int32)
        for pos in range(4):
            log_d, kv_d = model_d.apply(params, tok, jnp.asarray(pos),
                                        kv_d, cross_d, method=YMT3.decode_step)
            log_q, kv_q = model_q.apply(params, tok, jnp.asarray(pos),
                                        kv_q, cross_q, method=YMT3.decode_step)
            err = float(jnp.max(jnp.abs(log_d - log_q)))
            assert err < 2e-1, (pos, err)
            tok = jnp.argmax(log_d, -1)[:, None].astype(jnp.int32)

    def test_greedy_decode_runs_and_matches_shape(self):
        from yourmt3_tpu.config.model import T5_TINY
        from yourmt3_tpu.models.decoding import greedy_decode
        from yourmt3_tpu.models.ymt3 import YMT3
        cfg = T5_TINY.replace(vocab_size=600, d_kv=16, num_heads=4,
                              kv_quant="int8")
        model = YMT3(cfg)
        feats = jnp.asarray(
            np.random.default_rng(3).standard_normal((2, 16, 24)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), feats,
                            jnp.zeros((2, 1, 8), jnp.int32))
        mem = model.apply(params, feats, method=YMT3.encode)
        ids = greedy_decode(model, params, mem, 16)
        assert ids.shape == (2, 1, 16)
        assert ids.dtype == jnp.int32


class TestInt4Primitive:
    def test_pack_unpack_roundtrip_error_bound(self):
        from yourmt3_tpu.ops.kv_quant import quantize_kv4, unpack_kv4
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((4, 2, 16, 32)), jnp.float32)
        p, s = quantize_kv4(x)
        assert p.dtype == jnp.uint8 and p.shape == (4, 2, 16, 16)
        lo, hi = unpack_kv4(p)
        back = jnp.stack([lo, hi], -1).reshape(x.shape).astype(jnp.float32)
        back = back * s[..., None]
        # 4-bit step = rowmax/7; per-element error <= half a step
        step = np.asarray(s)[..., None]
        assert float(jnp.max(jnp.abs(back - x))) <= float(step.max()) * 0.51

    def test_attention_matches_dequantized_dense_exactly(self):
        """int4_decode_attention's split-plane algebra must equal dense
        attention ON THE DEQUANTIZED values (the only approximation is
        the 4-bit rounding itself, which this comparison removes)."""
        from yourmt3_tpu.ops.kv_quant import (int4_decode_attention,
                                              quantize_kv4, unpack_kv4)
        rng = np.random.default_rng(1)
        S, H, L, dk = 3, 2, 64, 32
        q = jnp.asarray(rng.standard_normal((S, H, 1, dk)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((S, H, L, dk)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((S, H, L, dk)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((1, H, 1, L)), jnp.float32)
        kp, ks = quantize_kv4(k)
        vp, vs = quantize_kv4(v)

        def deq(p, s):
            lo, hi = unpack_kv4(p)
            d = jnp.stack([lo, hi], -1).reshape(p.shape[:-1] + (dk,))
            return d.astype(jnp.float32) * s[..., None]

        logits = jnp.einsum("shqd,shld->shql", q, deq(kp, ks)) + bias
        want = jnp.einsum("shql,shld->shqd",
                          jax.nn.softmax(logits, -1), deq(vp, vs))
        got = int4_decode_attention(q, kp, ks, vp, vs, bias)
        # bf16 staging of exact int4 values: only accumulation-order noise
        assert float(jnp.max(jnp.abs(want - got))) < 2e-2

    def test_attention_close_to_unquantized(self):
        from yourmt3_tpu.ops.kv_quant import (int4_decode_attention,
                                              quantize_kv4)
        rng = np.random.default_rng(2)
        S, H, L, dk = 2, 2, 32, 16
        q = jnp.asarray(rng.standard_normal((S, H, 1, dk)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((S, H, L, dk)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((S, H, L, dk)), jnp.float32)
        logits = jnp.einsum("shqd,shld->shql", q, k)
        want = jnp.einsum("shql,shld->shqd", jax.nn.softmax(logits, -1), v)
        kp, ks = quantize_kv4(k)
        vp, vs = quantize_kv4(v)
        got = int4_decode_attention(q, kp, ks, vp, vs, None)
        # 4-bit rounding: ~7% row-max error pre-softmax; output stays close
        assert float(jnp.max(jnp.abs(want - got))) < 0.35


class TestModelInt4Decode:
    @pytest.mark.parametrize("kv_quant", ["int4", "int8c4"])
    @pytest.mark.slow
    def test_greedy_decode_runs_and_tracks_dense(self, kv_quant):
        """Full greedy decode through the model with int4/mixed caches:
        valid ids, and per-step logits stay close to the bf16 path (token
        flips allowed only where quantization noise crosses a near-tie)."""
        from yourmt3_tpu.config.model import T5_TINY
        from yourmt3_tpu.models.decoding import greedy_decode
        from yourmt3_tpu.models.ymt3 import YMT3
        cfg_d = T5_TINY.replace(vocab_size=600, d_kv=16, num_heads=4)
        cfg_q = cfg_d.replace(kv_quant=kv_quant)
        model_d, model_q = YMT3(cfg_d), YMT3(cfg_q)
        feats = jnp.asarray(
            np.random.default_rng(3).standard_normal((2, 16, 24)),
            jnp.float32)
        params = model_d.init(jax.random.PRNGKey(0), feats,
                              jnp.zeros((2, 1, 8), jnp.int32))
        mem = model_d.apply(params, feats, method=YMT3.encode)
        out_q = np.asarray(greedy_decode(model_q, params, mem, max_length=12))
        assert out_q.shape == (2, 1, 12)
        assert np.all((out_q >= 0) & (out_q < 600))
        # logits comparison on the first step (empty self cache: the
        # difference is pure cross-KV quantization)
        tok = jnp.asarray([[0], [0]], jnp.int32)
        cd = model_d.apply(params, mem, method=YMT3.init_cross_kv)
        cq = model_q.apply(params, mem, method=YMT3.init_cross_kv)
        ld, _ = model_d.apply(params, tok, jnp.asarray(0),
                              model_d.empty_self_kvs(2, 12), cd,
                              method=YMT3.decode_step)
        lq, _ = model_q.apply(params, tok, jnp.asarray(0),
                              model_q.empty_self_kvs(2, 12), cq,
                              method=YMT3.decode_step)
        assert float(jnp.max(jnp.abs(ld - lq))) < 1.0  # same logit scale
