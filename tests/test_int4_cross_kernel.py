"""Pallas int4 cross-attention (kv_quant="int8c4p"): packing round-trip,
kernel-vs-reference numerics (interpret mode on CPU), and decode-path
wiring parity against the dequantized dense computation.

The kernel exists because cross KV reads dominate the flagship's decode
bytes (EVIDENCE.md roofline) and XLA cannot contract over packed nibbles
in one pass (ops/pallas/decode_attention.int4_cross_attention docstring).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yourmt3_tpu.ops.kv_quant import (dequantize_kv4_crosspack,
                                      quantize_kv4_crosspack)
from yourmt3_tpu.ops.pallas.decode_attention import int4_cross_attention


def _reference(q, k, v):
    """softmax(q·Kᵀ)·V, fp32, no bias (cross attention semantics)."""
    logits = jnp.einsum("shd,shtd->sht", q.astype(jnp.float32),
                        k.astype(jnp.float32))
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("sht,shtd->shd", w, v.astype(jnp.float32))


class TestCrosspack:
    def test_roundtrip_error_bound(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((3, 2, 16, 8)), jnp.float32)
        p, s = quantize_kv4_crosspack(x)
        assert p.shape == (3, 2, 4, 16) and p.dtype == jnp.uint8
        back = dequantize_kv4_crosspack(p, s)
        # int4 symmetric: error ≤ half a step = scale/2 per row
        step = np.asarray(s)[..., None]
        assert float(jnp.max(jnp.abs(back - x))) <= float(step.max()) * 0.51

    def test_nibble_layout(self):
        # byte (d, t) must hold element d (low) and d+dk/2 (high), +8 bias
        x = jnp.zeros((1, 1, 1, 4), jnp.float32).at[0, 0, 0].set(
            jnp.asarray([7.0, -7.0, 1.0, 0.0]))
        p, s = quantize_kv4_crosspack(x)
        assert float(s[0, 0, 0]) == 1.0
        b = np.asarray(p)[0, 0, :, 0]  # (dk2,)
        assert b[0] == (7 + 8) | ((1 + 8) << 4)   # elems 0 and 2
        assert b[1] == (-7 + 8) | ((0 + 8) << 4)  # elems 1 and 3


class TestKernel:
    @pytest.mark.parametrize("S,H,T,dk", [(4, 2, 128, 32), (8, 6, 256, 64)])
    def test_matches_dequantized_reference(self, S, H, T, dk):
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.standard_normal((S, H, dk)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((S, H, T, dk)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((S, H, T, dk)), jnp.float32)
        k4, ks = quantize_kv4_crosspack(k)
        v4, vs = quantize_kv4_crosspack(v)
        # the kernel must match the EXACT attention over the dequantized
        # int4 values (same algebra, no extra approximation)
        want = _reference(q, dequantize_kv4_crosspack(k4, ks),
                          dequantize_kv4_crosspack(v4, vs))
        got = int4_cross_attention(q, k4, ks, v4, vs)
        assert got.shape == (S, H, dk)
        err = float(jnp.max(jnp.abs(want - got.astype(jnp.float32))))
        assert err < 2e-3, err

    def test_quantization_error_vs_float(self):
        rng = np.random.default_rng(2)
        S, H, T, dk = 4, 2, 128, 32
        q = jnp.asarray(rng.standard_normal((S, H, dk)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((S, H, T, dk)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((S, H, T, dk)), jnp.float32)
        k4, ks = quantize_kv4_crosspack(k)
        v4, vs = quantize_kv4_crosspack(v)
        want = _reference(q, k, v)
        got = int4_cross_attention(q, k4, ks, v4, vs)
        # int4 rounding noise: coarse sanity bound only (random normal
        # data is the worst case; logit noise ~0.3 shifts softmax mass).
        # The REAL quality gate is task F1 (int4 cross measured ≈ int8 on
        # the flagship: artifacts/eval_r5_int8c4.json).
        assert float(jnp.max(jnp.abs(want - got))) < 0.8
        assert float(jnp.mean(jnp.abs(want - got))) < 0.2

    def test_4d_query_squeeze(self):
        rng = np.random.default_rng(3)
        S, H, T, dk = 4, 2, 128, 32
        q = jnp.asarray(rng.standard_normal((S, H, 1, dk)), jnp.float32)
        k4, ks = quantize_kv4_crosspack(
            jnp.asarray(rng.standard_normal((S, H, T, dk)), jnp.float32))
        v4, vs = quantize_kv4_crosspack(
            jnp.asarray(rng.standard_normal((S, H, T, dk)), jnp.float32))
        out = int4_cross_attention(q, k4, ks, v4, vs)
        assert out.shape == (S, H, 1, dk)
        flat = int4_cross_attention(q[:, :, 0, :], k4, ks, v4, vs)
        np.testing.assert_allclose(np.asarray(out[:, :, 0, :]),
                                   np.asarray(flat), rtol=0, atol=0)


class TestDecodePathWiring:
    def test_greedy_tokens_close_to_int8c4(self):
        """kv_quant='int8c4p' runs end-to-end and its greedy decode
        matches the XLA int4-cross path (SAME int4 algebra, different
        packing) token-for-token on a tiny model."""
        from yourmt3_tpu.api import init_model
        from yourmt3_tpu.models.decoding import jit_greedy_decode
        from yourmt3_tpu.models.ymt3 import YMT3

        outs = {}
        for mode in ("int8c4", "int8c4p"):
            bundle = init_model("t5_tiny", "mt3_full_plus", kv_quant=mode,
                                seed=7)
            rng = np.random.default_rng(4)
            feats = jnp.asarray(rng.standard_normal(
                (2, bundle.audio_cfg.num_frames,
                 bundle.audio_cfg.num_feature_bins)) * 0.3, jnp.float32)
            mem = bundle.model.apply(bundle.params, feats,
                                     method=YMT3.encode)
            outs[mode] = np.asarray(jit_greedy_decode(
                bundle.model, bundle.params, mem, 32))
        # int4 values are identical under both packings; the only numeric
        # difference is summation order inside the dots. Argmax flips from
        # that epsilon are possible in principle — require ≥90% agreement
        # and identical shapes rather than bit equality.
        a, b = outs["int8c4"], outs["int8c4p"]
        assert a.shape == b.shape
        agree = float((a == b).mean())
        assert agree >= 0.9, agree
