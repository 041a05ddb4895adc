"""Early-exit decode with stream compaction must produce IDENTICAL tokens
to the plain while-loop greedy decode (VERDICT round-1 item 6)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yourmt3_tpu.config.model import T5_TINY
from yourmt3_tpu.models.decoding import greedy_decode, greedy_decode_early_exit
from yourmt3_tpu.models.ymt3 import YMT3


def _bundle(**kw):
    cfg = T5_TINY.replace(vocab_size=600, d_kv=16, num_heads=4, **kw)
    model = YMT3(cfg)
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 16, 24)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), feats,
                        jnp.zeros((4, cfg.num_channels, 8), jnp.int32))
    mem = model.apply(params, feats, method=YMT3.encode)
    return model, params, mem


@pytest.mark.parametrize("kw", [{}, {"kv_quant": "int8"},
                                {"kv_quant": "int8c4"},
                                {"kv_quant": "int4"}])
@pytest.mark.slow
def test_matches_plain_greedy(kw):
    model, params, mem = _bundle(**kw)
    L = 48
    want = np.asarray(greedy_decode(model, params, mem, L))
    got = np.asarray(greedy_decode_early_exit(model, params, mem, L,
                                              chunk=8))
    assert np.array_equal(want, got)


@pytest.mark.slow
def test_matches_with_prefix():
    model, params, mem = _bundle()
    L = 32
    prefix = jnp.asarray([5, 7], jnp.int32)
    want = np.asarray(greedy_decode(model, params, mem, L, prefix_ids=prefix))
    got = np.asarray(greedy_decode_early_exit(model, params, mem, L,
                                              prefix_ids=prefix, chunk=8))
    assert np.array_equal(want, got)


def test_compaction_actually_triggers():
    """With an untrained model EOS comes fast: force one long stream by
    banning its EOS via... simpler: assert the function works when chunk
    is tiny and streams finish at different times (the untrained model's
    argmax chains diverge per stream)."""
    model, params, mem = _bundle()
    L = 64
    got = np.asarray(greedy_decode_early_exit(model, params, mem, L,
                                              chunk=4, compact_threshold=1.0))
    want = np.asarray(greedy_decode(model, params, mem, L))
    assert np.array_equal(want, got)


@pytest.mark.parametrize("kw", [{}, {"kv_quant": "int8"}])
@pytest.mark.slow
def test_unroll_matches_plain_greedy(kw):
    """unroll>1 amortizes while-loop overhead; tokens must be IDENTICAL."""
    model, params, mem = _bundle(**kw)
    L = 48
    want = np.asarray(greedy_decode(model, params, mem, L))
    got = np.asarray(greedy_decode(model, params, mem, L, unroll=2))
    assert np.array_equal(want, got)
    got4 = np.asarray(greedy_decode(model, params, mem, L, unroll=4))
    assert np.array_equal(want, got4)


@pytest.mark.parametrize("kw", [{}, {"kv_quant": "int8"}])
@pytest.mark.slow
def test_phases_match_plain_greedy(kw):
    """Phase-chunked dense reads (static kv_len horizons) must be
    token-identical — masked positions were never read."""
    model, params, mem = _bundle(**kw)
    L = 48
    want = np.asarray(greedy_decode(model, params, mem, L))
    got = np.asarray(greedy_decode(model, params, mem, L, phases=4))
    assert np.array_equal(want, got)
    both = np.asarray(greedy_decode(model, params, mem, L, phases=2, unroll=2))
    assert np.array_equal(want, both)


@pytest.mark.slow
def test_phase_span_must_divide_unroll():
    """phases×unroll combos whose phase span is NOT a whole number of
    unroll groups are rejected: the unrolled body would cross the phase
    boundary and run steps against the previous phase's stale kv_len
    horizon, silently producing wrong tokens (confirmed by review repro:
    L=48, phases=3, unroll=6 diverged from the baseline)."""
    model, params, mem = _bundle()
    L = 48
    with pytest.raises(AssertionError):
        greedy_decode(model, params, mem, L, phases=3, unroll=6)
    # the boundary-safe neighbor combos still decode identically
    want = np.asarray(greedy_decode(model, params, mem, L))
    ok = np.asarray(greedy_decode(model, params, mem, L, phases=3, unroll=2))
    assert np.array_equal(want, ok)


class TestPublicPathIdentity:
    def test_early_exit_identical_through_api_int8(self):
        """Regression: the PUBLIC path must produce identical notes with
        and without early_exit, INCLUDING int8 KV. It once didn't — the
        plain path fused frontend+encode+decode into one program while
        early-exit encoded separately; the fusion-order rounding delta in
        the encoder memory was amplified by int8 KV quantization into
        argmax flips (mc13_r5 regime bench: 305 vs 539 notes on the same
        audio). All decode paths now consume api._encode_batch's memory."""
        import numpy as np
        from yourmt3_tpu.api import init_model, transcribe_audio_array
        from yourmt3_tpu.config.audio import AudioConfig
        ac = AudioConfig()
        bundle = init_model("t5_tiny", "mt3_midi", audio_cfg=ac,
                            kv_quant="int8")
        rng = np.random.default_rng(11)
        audio = (rng.standard_normal(int(ac.input_frames * 2.5))
                 .astype(np.float32) * 0.1)
        plain, err_p = transcribe_audio_array(bundle, audio, batch_size=2)
        early, err_e = transcribe_audio_array(bundle, audio, batch_size=2,
                                              early_exit=True)
        assert err_p.total() == err_e.total()
        assert plain == early
