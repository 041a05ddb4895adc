"""Paged decode-attention kernel: parity vs dense reference (interpret
mode on CPU) and the cache-update helpers (SURVEY.md §7 hard-part 2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yourmt3_tpu.ops.pallas.decode_attention import (
    empty_paged_cache, paged_cache_update, paged_decode_attention,
    paged_to_dense, reference_decode_attention)


class TestPagedKernel:
    @pytest.mark.parametrize("pos", [0, 5, 127, 128, 200, 255])
    def test_matches_dense(self, pos):
        rng = np.random.default_rng(0)
        S, H, L, dk, BLK = 4, 2, 256, 32, 128
        q = jnp.asarray(rng.standard_normal((S, H, dk)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((L // BLK, S, H, BLK, dk)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((L // BLK, S, H, BLK, dk)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((H, L)), jnp.float32)
        want = reference_decode_attention(q, k, v, pos, bias)
        got = paged_decode_attention(q, k, v, jnp.asarray(pos), bias,
                                     block=BLK, streams_per_tile=2,
                                     interpret=True)
        assert float(jnp.max(jnp.abs(want - got))) < 1e-4

    def test_cache_update_roundtrip(self):
        rng = np.random.default_rng(1)
        S, H, dk, L, BLK = 3, 2, 16, 256, 128
        c = empty_paged_cache(S, H, dk, L, BLK, jnp.float32)
        step = jnp.asarray(rng.standard_normal((S, H, 1, dk)), jnp.float32)
        for pos in (0, 127, 128, 255):
            c2 = paged_cache_update(c, step, jnp.asarray(pos))
            dense = paged_to_dense(c2)
            assert np.allclose(np.asarray(dense[:, :, :, pos]),
                               np.asarray(step[:, :, 0, :]))
            # everything else untouched (zero)
            mask = np.ones(L, bool)
            mask[pos] = False
            assert np.all(np.asarray(dense[:, :, :, mask]) == 0)

    @pytest.mark.slow
    def test_model_decode_step_with_pallas_flag(self):
        """decode_step logits with the paged-cache path must match the
        dense-cache path numerically (argmax chains on an UNTRAINED model
        diverge from ulp-level ties, so compare logits, not tokens)."""
        from yourmt3_tpu.config.model import T5_TINY
        from yourmt3_tpu.models.ymt3 import YMT3
        cfg_d = T5_TINY.replace(vocab_size=600, d_kv=16, num_heads=4)
        cfg_p = cfg_d.replace(use_pallas_decode=True)
        model_d, model_p = YMT3(cfg_d), YMT3(cfg_p)
        feats = jnp.asarray(np.random.default_rng(2).standard_normal((1, 16, 24)),
                            jnp.float32)
        params = model_d.init(jax.random.PRNGKey(0), feats,
                              jnp.zeros((1, 1, 8), jnp.int32))
        mem = model_d.apply(params, feats, method=YMT3.encode)
        cross = model_d.apply(params, mem, method=YMT3.init_cross_kv)
        kv_d = model_d.empty_self_kvs(1, 128)
        kv_p = model_p.empty_self_kvs(1, 128)
        tok = jnp.asarray([[42]], jnp.int32)
        for pos in range(4):
            log_d, kv_d = model_d.apply(params, tok, jnp.asarray(pos),
                                        kv_d, cross, method=YMT3.decode_step)
            log_p, kv_p = model_p.apply(params, tok, jnp.asarray(pos),
                                        kv_p, cross, method=YMT3.decode_step)
            err = float(jnp.max(jnp.abs(log_d - log_p)))
            assert err < 5e-2, (pos, err)
            tok = jnp.argmax(log_d, -1)[:, None].astype(jnp.int32)


class TestPagedCross:
    @pytest.mark.parametrize("T,blk", [(256, 128), (48, 16)])
    def test_cross_matches_dense(self, T, blk):
        """Fused cross-attention kernel == dense softmax(q·K)·V over the
        full (static) encoder KV, including non-128 block sizes."""
        from yourmt3_tpu.ops.pallas.decode_attention import (
            dense_to_paged, paged_cross_attention)
        rng = np.random.default_rng(3)
        S, H, dk = 4, 2, 32
        q = jnp.asarray(rng.standard_normal((S, H, dk)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((S, H, T, dk)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((S, H, T, dk)), jnp.float32)
        logits = jnp.einsum("shd,shtd->sht", q, k)
        want = jnp.einsum("sht,shtd->shd", jax.nn.softmax(logits, -1), v)
        got = paged_cross_attention(q, dense_to_paged(k, blk),
                                    dense_to_paged(v, blk), T,
                                    streams_per_tile=2, interpret=True)
        assert float(jnp.max(jnp.abs(want - got))) < 1e-4

    def test_dense_to_paged_roundtrip(self):
        from yourmt3_tpu.ops.pallas.decode_attention import (
            dense_to_paged, paged_to_dense)
        rng = np.random.default_rng(4)
        kv = jnp.asarray(rng.standard_normal((3, 2, 256, 16)), jnp.float32)
        paged = dense_to_paged(kv, 64)
        assert paged.shape == (4, 3, 2, 64, 16)
        dense = paged_to_dense(paged)  # (S, H, dk, L)
        assert np.allclose(np.asarray(dense),
                           np.asarray(kv.transpose(0, 1, 3, 2)))


class TestRelTableBias:
    @pytest.mark.parametrize("pos", [0, 127, 200])
    def test_in_kernel_bias_matches_dense(self, pos):
        from yourmt3_tpu.models.layers import relative_position_bucket
        rng = np.random.default_rng(0)
        S, H, L, dk, BLK = 4, 6, 256, 32, 128
        BUCKETS, MAXD = 32, 128
        q = jnp.asarray(rng.standard_normal((S, H, dk)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((L // BLK, S, H, BLK, dk)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((L // BLK, S, H, BLK, dk)), jnp.float32)
        table = jnp.asarray(rng.standard_normal((BUCKETS, H)), jnp.float32)
        j = jnp.arange(L)
        buckets = relative_position_bucket(j[None, :] - pos, False,
                                           BUCKETS, MAXD)[0]
        bias_row = table[buckets].T
        want = reference_decode_attention(q, k, v, pos, bias_row)
        got = paged_decode_attention(q, k, v, jnp.asarray(pos),
                                     rel_table=table, rel_max_distance=MAXD,
                                     block=BLK, streams_per_tile=2,
                                     interpret=True)
        assert float(jnp.max(jnp.abs(want - got))) < 1e-4
