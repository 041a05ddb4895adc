"""Beam search decode: beam=1 ≡ greedy, beam>1 never scores worse."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yourmt3_tpu.config.model import T5_TINY
from yourmt3_tpu.models.decoding import beam_decode, greedy_decode
from yourmt3_tpu.models.ymt3 import YMT3
from yourmt3_tpu.tokens.codec import EOS_ID, PAD_ID


@pytest.fixture(scope="module")
def built():
    cfg = T5_TINY.replace(vocab_size=64)
    model = YMT3(cfg)
    feats = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 24)),
                        jnp.float32)
    params = model.init(jax.random.PRNGKey(3), feats,
                        jnp.zeros((2, 1, 8), jnp.int32))
    mem = model.apply(params, feats, method=YMT3.encode)
    return cfg, model, params, mem


class TestBeam:
    def test_beam1_equals_greedy(self, built):
        cfg, model, params, mem = built
        g = np.asarray(greedy_decode(model, params, mem, max_length=16))
        b = np.asarray(beam_decode(model, params, mem, max_length=16,
                                   beam_size=1))
        assert np.array_equal(g, b), (g[0, 0], b[0, 0])

    def test_beam_shapes_and_padding(self, built):
        cfg, model, params, mem = built
        out = np.asarray(beam_decode(model, params, mem, max_length=12,
                                     beam_size=3))
        assert out.shape == (2, 1, 12)
        # after first EOS everything is PAD
        for row in out.reshape(-1, 12):
            eos = np.where(row == EOS_ID)[0]
            if len(eos):
                assert np.all(row[eos[0] + 1:] == PAD_ID)

    def test_beam_winner_is_model_consistent(self, built):
        """The beam winner must be self-consistent: re-scoring it teacher-
        forced gives a finite log-prob and every token is in-vocab. (Beam
        is NOT guaranteed to dominate greedy in recomputed log-prob — the
        greedy path can fall out of the beam, and shorter early-EOS
        sequences win raw-sum comparisons — so no dominance assert.)"""
        from yourmt3_tpu.models.ymt3 import shift_right
        cfg, model, params, mem = built

        def lp(tokens):  # (L,) ids for batch el 0
            ids = shift_right(jnp.asarray(tokens)[None, None, :])
            logits = model.apply(params, ids, mem[:1],
                                 method=lambda m, i, me: m.decoder(i[:, 0], me[:, 0]))
            logz = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            tot = 0.0
            for t in range(len(tokens)):
                tok = int(tokens[t])
                tot += float(logz[0, t, tok])
                if tok in (EOS_ID, PAD_ID):
                    break
            return tot

        b = np.asarray(beam_decode(model, params, mem[:1], max_length=12,
                                   beam_size=4, length_penalty=0.0))[0, 0]
        assert np.all((b >= 0) & (b < cfg.vocab_size))
        assert np.isfinite(lp(b))

    def test_beam_with_prefix(self, built):
        cfg, model, params, mem = built
        out = np.asarray(beam_decode(model, params, mem, max_length=8,
                                     beam_size=2,
                                     prefix_ids=jnp.asarray([7, 9], jnp.int32)))
        assert np.all(out[:, :, 0] == 7) and np.all(out[:, :, 1] == 9)


@pytest.mark.slow
class TestBeamOnPublicPath:
    def test_transcribe_audio_array_beam(self):
        """beam_size>1 through the PUBLIC api path: decodes every segment
        with batched beam search and feeds the detokenizer (untrained
        model => garbage notes, but shapes/merge must hold)."""
        import numpy as np
        from yourmt3_tpu.api import init_model, transcribe_audio_array
        from yourmt3_tpu.config.audio import AudioConfig
        ac = AudioConfig()
        bundle = init_model("t5_tiny", "mt3_midi", audio_cfg=ac)
        rng = np.random.default_rng(0)
        audio = (rng.standard_normal(int(ac.input_frames * 2.5))
                 .astype(np.float32) * 0.1)
        notes, err = transcribe_audio_array(bundle, audio, batch_size=2,
                                            beam_size=2)
        assert isinstance(notes, list)

    def test_beam_multichannel(self):
        """Beams fold into the stream axis (S·K = B·C·K), so beam decode
        must be channel-agnostic: beam1 ≡ greedy on the multi-channel
        decoder, and beam>1 keeps the (B, C, L) contract."""
        cfg = T5_TINY.replace(vocab_size=64, num_channels=3,
                              decoder_type="multi-t5")
        model = YMT3(cfg)
        feats = jnp.asarray(
            np.random.default_rng(7).standard_normal((2, 16, 24)),
            jnp.float32)
        params = model.init(jax.random.PRNGKey(5), feats,
                            jnp.zeros((2, 3, 8), jnp.int32))
        mem = model.apply(params, feats, method=YMT3.encode)
        g = np.asarray(greedy_decode(model, params, mem, max_length=12))
        b1 = np.asarray(beam_decode(model, params, mem, max_length=12,
                                    beam_size=1))
        assert g.shape == b1.shape == (2, 3, 12)
        assert np.array_equal(g, b1)
        b3 = np.asarray(beam_decode(model, params, mem, max_length=12,
                                    beam_size=3))
        assert b3.shape == (2, 3, 12)

    def test_beam_and_early_exit_exclusive(self):
        import numpy as np
        import pytest
        from yourmt3_tpu.api import init_model, transcribe_audio_array
        from yourmt3_tpu.config.audio import AudioConfig
        ac = AudioConfig()
        bundle = init_model("t5_tiny", "mt3_midi", audio_cfg=ac)
        with pytest.raises(ValueError, match="mutually exclusive"):
            transcribe_audio_array(
                bundle, np.zeros(ac.input_frames, np.float32),
                beam_size=2, early_exit=True)
