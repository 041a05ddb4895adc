"""Degenerate-decode cutoff (models/decoding.greedy_decode repetition_guard).

Round-3 finding: greedy on the trained flagship collapsed on one track
(test_014: onset F1 0.16, a 129-token repeat stream) while every other
track read ~0.6. No valid MT3 stream repeats a token consecutively (shift
tokens are monotonic, chord pitches ascend, program/velocity states only
change), so a long identical run is always a decode failure — the guard
force-EOSes it instead of letting it poison the segment.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yourmt3_tpu.api import init_model
from yourmt3_tpu.models.decoding import greedy_decode
from yourmt3_tpu.models.ymt3 import YMT3
from yourmt3_tpu.tokens.codec import EOS_ID, PAD_ID


@pytest.fixture(scope="module")
def built():
    b = init_model("t5_tiny", task="mt3_full_plus_256",
                   num_encoder_layers=1, num_decoder_layers=1)
    feats = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 256, 512)), jnp.float32)
    memory = b.model.apply(b.params, feats, method=YMT3.encode)
    return b, memory


def _runs(row):
    """Longest identical consecutive run among non-PAD tokens."""
    best = cur = 1
    for a, z in zip(row, row[1:]):
        if z == PAD_ID:
            break
        cur = cur + 1 if a == z else 1
        best = max(best, cur)
    return best


@pytest.mark.slow
class TestRepetitionGuard:
    def test_guard_caps_runs_and_terminates_with_eos(self, built,
                                                     monkeypatch):
        b, memory = built
        vocab = b.cfg.vocab_size
        real_step = YMT3.decode_step

        def stuck_step(self, token_ids, pos, self_kvs, cross_kvs, kv_len=0):
            # a degenerate decoder: argmax is ALWAYS token 7 (the round-3
            # test_014 failure mode, made deterministic)
            logits, kvs = real_step(self, token_ids, pos, self_kvs,
                                    cross_kvs, kv_len=kv_len)
            stuck = jnp.full_like(logits, -1e9).at[:, 7].set(0.0)
            return stuck, kvs

        monkeypatch.setattr(YMT3, "decode_step", stuck_step)
        out = np.asarray(greedy_decode(b.model, b.params, memory,
                                       max_length=32, repetition_guard=5))
        for row in out.reshape(-1, 32):
            row = row.tolist()
            assert _runs(row) < 5, row
            # the 5th consecutive identical emission is replaced by the
            # forced EOS, so the visible run is guard-1 tokens long
            assert row[:6] == [7, 7, 7, 7, EOS_ID, PAD_ID], row
        # without the guard the same decoder really does run away
        raw = np.asarray(greedy_decode(b.model, b.params, memory,
                                       max_length=32))
        assert raw.reshape(-1, 32)[0].tolist() == [7] * 32

    def test_guard_off_is_token_identical(self, built):
        b, memory = built
        base = np.asarray(greedy_decode(b.model, b.params, memory,
                                        max_length=16))
        huge = np.asarray(greedy_decode(b.model, b.params, memory,
                                        max_length=16,
                                        repetition_guard=10**6))
        np.testing.assert_array_equal(base, huge)

    def test_guard_cuts_period2_cycles(self, built, monkeypatch):
        b, memory = built
        real_step = YMT3.decode_step

        def cycling_step(self, token_ids, pos, self_kvs, cross_kvs,
                         kv_len=0):
            # degenerate decoder alternating tokens 7 and 9 (period-2
            # collapse: two tokens without an advancing shift cannot
            # encode notes, but the period-1 guard never fires on it)
            logits, kvs = real_step(self, token_ids, pos, self_kvs,
                                    cross_kvs, kv_len=kv_len)
            want = jnp.where(pos % 2 == 0, 7, 9)
            stuck = jnp.full_like(logits, -1e9)
            stuck = stuck.at[:, want].set(0.0)
            return stuck, kvs

        monkeypatch.setattr(YMT3, "decode_step", cycling_step)
        out = np.asarray(greedy_decode(b.model, b.params, memory,
                                       max_length=32, repetition_guard=4))
        for row in out.reshape(-1, 32):
            row = row.tolist()
            # cycle must be cut by a forced EOS well before max_length
            assert EOS_ID in row, row
            cut = row.index(EOS_ID)
            assert cut <= 2 * 4 + 2, row  # ≈ 2·guard steps in cycle
            assert all(t == PAD_ID for t in row[cut + 1:]), row
        # without the guard the cycle really does run away
        raw = np.asarray(greedy_decode(b.model, b.params, memory,
                                       max_length=32))
        assert EOS_ID not in raw.reshape(-1, 32)[0].tolist()
