"""Perceiver-TF / Conformer encoder family tests (SURVEY.md C22, C23)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yourmt3_tpu.config.model import CONFORMER_SMALL, PERCEIVER_TF_MC13
from yourmt3_tpu.models.decoding import greedy_decode
from yourmt3_tpu.models.ymt3 import YMT3, ce_loss, shift_right


def tiny_ptf_cfg(**kw):
    base = dict(
        vocab_size=600, ptf_num_latents=26, ptf_d_latent=32, ptf_num_blocks=2,
        d_model=64, d_kv=16, num_heads=4, d_ff=128, num_decoder_layers=2,
        conv_channels=16, max_target_length=32)
    base.update(kw)
    return PERCEIVER_TF_MC13.replace(**base)


@pytest.mark.slow
class TestPerceiverTF:
    @pytest.fixture(scope="class")
    def built(self):
        cfg = tiny_ptf_cfg()
        model = YMT3(cfg)
        feats = jnp.zeros((2, 16, 64))
        ids = jnp.zeros((2, 13, 8), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), feats, ids)
        return cfg, model, params, feats, ids

    def test_forward_and_memory_shapes(self, built):
        cfg, model, params, feats, ids = built
        logits = model.apply(params, feats, ids)
        assert logits.shape == (2, 13, 8, 600)
        mem = model.apply(params, feats, method=YMT3.encode)
        # 26 latents grouped into 13 channels of 2
        assert mem.shape == (2, 13, 16, cfg.d_model)

    def test_decode_and_loss(self, built):
        cfg, model, params, feats, ids = built
        out = greedy_decode(model, params,
                            model.apply(params, feats, method=YMT3.encode),
                            max_length=8)
        assert out.shape == (2, 13, 8)
        loss, _ = ce_loss(model.apply(params, feats, ids), ids)
        assert np.isfinite(float(loss))

    def test_channel_grouping_requires_divisibility(self):
        cfg = tiny_ptf_cfg(ptf_num_latents=25)
        model = YMT3(cfg)
        with pytest.raises(ValueError, match="not divisible"):
            model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 64)),
                       jnp.zeros((1, 13, 4), jnp.int32))

    def test_moe_variant(self):
        cfg = tiny_ptf_cfg(ptf_num_moe_experts=4, ptf_moe_topk=2)
        model = YMT3(cfg)
        feats = jnp.ones((1, 8, 64))
        # non-PAD labels: all-PAD would mask the loss to zero ⇒ zero grads
        ids = jnp.full((1, 13, 4), 7, jnp.int32)
        params = model.init(jax.random.PRNGKey(0), feats, ids)
        logits = model.apply(params, feats, ids)
        assert logits.shape == (1, 13, 4, 600)
        # grads flow through router + experts
        g = jax.grad(lambda p: ce_loss(model.apply(p, feats, ids), ids)[0])(params)
        moe_leaves = [l for path, l in
                      jax.tree_util.tree_flatten_with_path(g)[0]
                      if any("ff" in str(k) for k in path)]
        assert any(float(jnp.abs(l).max()) > 0 for l in moe_leaves)


class TestConformer:
    def test_forward_and_decode(self):
        cfg = CONFORMER_SMALL.replace(
            vocab_size=600, d_model=64, d_kv=16, num_heads=4, d_ff=128,
            num_encoder_layers=2, num_decoder_layers=2, max_target_length=32)
        model = YMT3(cfg)
        feats = jnp.zeros((2, 16, 64))
        ids = jnp.zeros((2, 1, 8), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), feats, ids)
        logits = model.apply(params, feats, ids)
        assert logits.shape == (2, 1, 8, 600)
        mem = model.apply(params, feats, method=YMT3.encode)
        out = greedy_decode(model, params, mem, max_length=8)
        assert out.shape == (2, 1, 8)


@pytest.mark.slow
class TestPositionalAndProjectionVariants:
    """SURVEY C24 options: RoPE / ALiBi temporal positions in Perceiver-TF
    and depthwise-conv projection variants (config-gated)."""

    def _ptf_cfg(self, **kw):
        from yourmt3_tpu.config.model import PERCEIVER_TF_MC13
        return PERCEIVER_TF_MC13.replace(
            vocab_size=600, ptf_d_latent=64, ptf_num_latents=26,
            ptf_num_blocks=1, num_decoder_layers=1, d_model=64, d_kv=16,
            num_heads=4, d_ff=128, **kw)

    @pytest.mark.parametrize("pos", ["trainable", "rope", "alibi"])
    def test_perceiver_pos_enc_variants(self, pos):
        import jax
        from yourmt3_tpu.models.ymt3 import YMT3
        cfg = self._ptf_cfg(ptf_pos_enc=pos)
        model = YMT3(cfg)
        feats = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 16, 24)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), feats,
                            jnp.zeros((1, 13, 8), jnp.int32))
        mem = model.apply(params, feats, method=YMT3.encode)
        assert mem.shape == (1, 13, 16, 64)
        assert bool(jnp.all(jnp.isfinite(mem.astype(jnp.float32))))
        flat = jax.tree_util.tree_leaves(params)
        has_timepos = any("time_pos" in "/".join(map(str, p))
                          for p, _ in jax.tree_util.tree_flatten_with_path(
                              params)[0])
        assert has_timepos == (pos == "trainable")

    def test_rope_is_position_sensitive(self):
        """Rotations must make attention depend on token order."""
        from yourmt3_tpu.models.layers import rope_rotate
        x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 2, 8, 16)),
                        jnp.float32)
        r = rope_rotate(x)
        assert r.shape == x.shape
        # position 0 is unrotated; later positions are not
        assert np.allclose(np.asarray(r[:, :, 0]), np.asarray(x[:, :, 0]),
                           atol=1e-5)
        assert not np.allclose(np.asarray(r[:, :, 3]), np.asarray(x[:, :, 3]))

    def test_group_conv_projection(self):
        import jax
        from yourmt3_tpu.models.ymt3 import YMT3
        cfg = self._ptf_cfg(proj_type="group-conv")
        model = YMT3(cfg)
        feats = jnp.asarray(
            np.random.default_rng(2).standard_normal((1, 16, 24)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), feats,
                            jnp.zeros((1, 13, 8), jnp.int32))
        mem = model.apply(params, feats, method=YMT3.encode)
        assert mem.shape == (1, 13, 16, 64)

    def test_depthwise_conv_projection_t5(self):
        import jax
        from yourmt3_tpu.config.model import T5_TINY
        from yourmt3_tpu.models.ymt3 import YMT3
        cfg = T5_TINY.replace(vocab_size=600, proj_type="depthwise-conv")
        model = YMT3(cfg)
        feats = jnp.asarray(
            np.random.default_rng(3).standard_normal((1, 16, 24)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), feats,
                            jnp.zeros((1, 1, 8), jnp.int32))
        mem = model.apply(params, feats, method=YMT3.encode)
        assert mem.shape == (1, 1, 16, cfg.d_model)


@pytest.mark.slow
class TestAbsoluteTimeSignal:
    """Locks the round-3 flagship fix: the Perceiver-TF encoder output
    must carry an ABSOLUTE time-within-segment signal (MT3 shift tokens
    are absolute; without this the decoder is time-blind — measured:
    shift-token TF accuracy stalled at 0.006 and end-to-end onset F1 at
    0.095 after 30 k steps, runs/mc13_r3)."""

    def test_sinusoid_is_injected_into_the_forward(self):
        # the sinusoid is NOT a parameter: the exact same param tree run
        # with the flag on vs off must produce materially different
        # memories. (A pure time-variance check is not diagnostic here —
        # the conv pre-encoder's zero padding makes even the "none"
        # variant time-varying at the segment edges.)
        feats = jnp.ones((1, 16, 64))
        ids = jnp.zeros((1, 13, 4), jnp.int32)
        cfg_sin = tiny_ptf_cfg(encoder_abs_pos="sinusoidal")
        params = YMT3(cfg_sin).init(jax.random.PRNGKey(0), feats, ids)
        mem_sin = YMT3(cfg_sin).apply(params, feats, method=YMT3.encode)
        mem_off = YMT3(tiny_ptf_cfg(encoder_abs_pos="none")).apply(
            params, feats, method=YMT3.encode)
        diff = float(np.mean(np.abs(np.asarray(mem_sin - mem_off))))
        mag = float(np.mean(np.abs(np.asarray(mem_sin)))) + 1e-9
        assert diff / mag > 0.05, (diff, mag)

    def test_preset_default_is_sinusoidal(self):
        assert PERCEIVER_TF_MC13.encoder_abs_pos == "sinusoidal"


class TestConformerPerBlockAnchor:
    """The conformer's per-block time re-anchoring is a DISTINCT config
    value ("sinusoidal_per_block") so checkpoint meta disambiguates it from
    the input-only "sinusoidal" forward old checkpoints trained with
    (ADVICE r3: silent numerics change on restore otherwise)."""

    def _cfg(self, **kw):
        return CONFORMER_SMALL.replace(
            vocab_size=600, d_model=64, d_kv=16, num_heads=4, d_ff=128,
            num_encoder_layers=2, num_decoder_layers=2,
            max_target_length=32, **kw)

    def test_preset_default_is_per_block(self):
        assert CONFORMER_SMALL.encoder_abs_pos == "sinusoidal_per_block"

    def test_per_block_and_input_only_are_distinct_forwards(self):
        feats = jnp.ones((1, 16, 64))
        ids = jnp.zeros((1, 1, 4), jnp.int32)
        cfg_pb = self._cfg()
        params = YMT3(cfg_pb).init(jax.random.PRNGKey(0), feats, ids)
        mem_pb = YMT3(cfg_pb).apply(params, feats, method=YMT3.encode)
        # same params restore cleanly under the input-only value (shape-
        # compatible) but produce the input-only numerics, not per-block
        mem_in = YMT3(self._cfg(encoder_abs_pos="sinusoidal")).apply(
            params, feats, method=YMT3.encode)
        diff = float(np.mean(np.abs(np.asarray(mem_pb - mem_in))))
        mag = float(np.mean(np.abs(np.asarray(mem_pb)))) + 1e-9
        assert diff / mag > 0.02, (diff, mag)

    def test_checkpoint_meta_round_trips_the_value(self, tmp_path):
        import json
        import os
        from yourmt3_tpu.api import init_model
        from yourmt3_tpu.train.checkpoint import restore_bundle, save_bundle
        bundle = init_model(
            "conformer_small", task="mt3_full_plus_256",
            d_model=64, d_kv=16, num_heads=4, d_ff=128,
            num_encoder_layers=2, num_decoder_layers=2)
        assert bundle.cfg.encoder_abs_pos == "sinusoidal_per_block"
        ck = str(tmp_path / "ck")
        save_bundle(ck, bundle, step=1)
        with open(os.path.join(ck, "ymt3_meta.json")) as f:
            meta = json.load(f)
        assert meta["model"]["encoder_abs_pos"] == "sinusoidal_per_block"
        # an OLD conformer checkpoint that recorded input-only injection
        # must restore with input-only injection, not the new default
        meta["model"]["encoder_abs_pos"] = "sinusoidal"
        with open(os.path.join(ck, "ymt3_meta.json"), "w") as f:
            json.dump(meta, f)
        restored = restore_bundle(ck)
        assert restored.cfg.encoder_abs_pos == "sinusoidal"
